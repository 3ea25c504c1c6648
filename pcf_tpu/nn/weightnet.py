"""WeightNet — the MLP that generates per-neighbor convolution weights.

Reference: layers.py:127-191. Runs Linear_BN + ReLU on the (VI-)relative
coordinates [M, K, in_ch] and outputs [M, K, out_ch] weights that are then
contracted against the gathered features. The reference applies ReLU after
*every* layer including the last (layers.py:163-171) — reproduced here.

`efficient=True` maps the reference's gradient checkpointing
(util/checkpoint.py:27-46, cp_batchnorm.py) to `nn.remat`: the [M, K, hidden]
activations are recomputed in the backward pass instead of stored, trading
FLOPs for HBM — the standard TPU rematerialization play.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pcf_tpu.nn.norm import LinearBN


class _WeightNetCore(nn.Module):
    out_channel: int
    hidden_unit: Sequence[int]
    use_bn: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    bn_momentum: float = 0.1
    flat_k: int = 0  # flat-lane mode: x is [M, K*in_c] (see nn/norm.py)

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        dims = list(self.hidden_unit) + [self.out_channel]
        for i, d in enumerate(dims):
            x = LinearBN(d, use_bn=self.use_bn, axis_name=self.axis_name,
                         dtype=self.dtype, bn_momentum=self.bn_momentum,
                         flat_k=self.flat_k,
                         name=f"mlp_convs_{i}")(x, mask=mask, train=train)
            x = nn.relu(x)
        return x


class WeightNet(nn.Module):
    out_channel: int
    hidden_unit: Sequence[int] = (8, 8)
    efficient: bool = False
    use_bn: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    flat_k: int = 0  # flat-lane mode (param tree unchanged; see nn/norm.py)

    @nn.compact
    def __call__(
        self, localized_xyz: jnp.ndarray, mask=None, train: bool = False
    ) -> jnp.ndarray:
        hidden = self.hidden_unit if self.hidden_unit else ()
        core = _WeightNetCore if not self.efficient else nn.remat(
            _WeightNetCore, static_argnums=(3,), prevent_cse=False
        )
        # Training-dynamics parity quirk: the reference's checkpointed
        # WeightNet (efficient=True, always) runs its BN forward TWICE per
        # training step — once in CheckpointFunction.forward (stats update
        # under no_grad) and once in the backward recompute
        # (util/checkpoint.py:29-46; verified num_batches_tracked += 2) —
        # so running stats are EMA-updated twice on the SAME batch stats.
        # nn.remat updates once; the equivalent single update uses momentum
        # 1-(1-m)^2 (= 0.19 at torch's default 0.1).
        m = 0.1
        bn_momentum = 1.0 - (1.0 - m) ** 2 if self.efficient else m
        return core(
            self.out_channel, hidden, self.use_bn, self.axis_name, self.dtype,
            bn_momentum, self.flat_k, name="core"
        )(localized_xyz, mask, train)
