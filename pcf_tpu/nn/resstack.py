"""Residual-block stacks as lax.scan over stacked parameters.

The reference unrolls up to 6 identical PCFLayer residual blocks per level
(model_architecture.py:151-173). Unrolling is the wrong shape for XLA: each
block re-traces and re-compiles the same graph, and the flagship model's
compile time is dominated by it. Here the N identical blocks become ONE
compiled block body scanned over a stacked parameter axis (flax nn.scan) —
the standard TPU treatment of repeated layers.

Semantics note: the reference computes VI features in the first residual
block and reuses them in the rest (model_architecture.py:221-241). Since the
VI features depend only on geometry (coords/normals/edges), they are computed
once OUTSIDE the scan and broadcast to every block — identical math.
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import flax.linen as nn


class _Body(nn.Module):
    block_cls: Type[nn.Module]
    channels: int
    cfg: Any
    weightnet: tuple
    num_heads: int
    train: bool

    @nn.compact
    def __call__(self, carry, xyz, nei_inds, norms, vi_features,
                 localized_xyz, mask):
        if self.block_cls.__name__ == "PCFLayer":
            block = self.block_cls(self.channels, self.channels, self.cfg,
                                   self.weightnet, self.num_heads, name="block")
        else:
            block = self.block_cls(self.channels, self.channels, self.cfg,
                                   self.weightnet, name="block")
        out, _wni = block(xyz, carry, nei_inds, norms,
                          vi_features=vi_features, localized_xyz=localized_xyz,
                          dense_mask=mask, train=self.train)
        return out, None


class ResBlockStack(nn.Module):
    """n_blocks identical same-resolution residual blocks, scanned."""

    block_cls: Type[nn.Module]  # PCFLayer or PointConvStridePE
    n_blocks: int
    channels: int
    cfg: Any
    weightnet: Sequence[int]
    num_heads: int = 4

    @nn.compact
    def __call__(self, xyz, feats, nei_inds, norms, vi_features=None,
                 localized_xyz=None, mask=None, train: bool = False):
        if self.n_blocks == 0:
            return feats

        body_cls = _Body
        if self.cfg.get("remat_blocks"):
            # Recompute each block in the backward instead of saving its
            # gathered [M,K,C] / weight intermediates to HBM. Measured
            # speed-NEUTRAL on v5e (75.2 vs 76.0 ms flagship train step) —
            # this is a memory knob for big-batch / 2cm configs, off by
            # default.
            body_cls = nn.remat(_Body, static_argnums=())
        ScanBody = nn.scan(
            body_cls,
            variable_axes={"params": 0, "batch_stats": 0, "intermediates": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=(nn.broadcast,) * 6,
            length=self.n_blocks,
        )
        out, _ = ScanBody(
            self.block_cls, self.channels, self.cfg, tuple(self.weightnet),
            self.num_heads, train, name="blocks",
        )(feats, xyz, nei_inds, norms, vi_features, localized_xyz, mask)
        return out
