"""On-device kNN after batching — the post_knn path.

Replaces knn_post_dataloader_utils.py (KeOps argKmin / cuVS brute force,
:10-41, and compute_knn_packed, :171-223): the host pipeline only grid-
subsamples (datasetCommon.subsample), and the three edge sets per level are
computed on the TPU with the tiled-distance-matrix kNN, directly on the
packed layout (batch ids keep neighborhoods within each cloud — no per-cloud
slicing loop like the reference needs).

Enabled via cfg.post_knn (reference: README.md:63-65, trainer wiring at
train_ScanNet_DDP_WarmUP.py:379-386).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pcf_tpu.core.batching import PackedPyramid
from pcf_tpu.ops.knn import knn
from pcf_tpu.ops.subsample import grid_subsample_fixed


@functools.partial(jax.jit,
                   static_argnames=("k_self", "k_forward", "k_propagate",
                                    "method"))
def compute_knn_packed(
    batch: PackedPyramid,
    k_self: tuple,
    k_forward: tuple,
    k_propagate: tuple,
    method: str = "approx",
) -> PackedPyramid:
    """Fill edges_self/forward/propagate of a post_knn-packed batch on device.

    method='approx' (default) uses lax.approx_max_k (~0.997 recall@16, ~5x
    faster than exact top_k on v5e); the reference's own kNN providers
    (sklearn/nanoflann/KeOps/cuVS) already differ in tie handling, so graph
    parity is statistical, not exact. Pass method='exact' for exactness."""
    n_levels = batch.num_levels
    edges_self, edges_forward, edges_propagate = [], [], []
    for l in range(n_levels):
        edges_self.append(knn(
            batch.points[l], batch.points[l], int(k_self[l]),
            query_bid=batch.bids[l], ref_bid=batch.bids[l],
            ref_mask=batch.masks[l], method=method))
        if l < n_levels - 1:
            # forward: queries at level l+1, refs at level l
            edges_forward.append(knn(
                batch.points[l + 1], batch.points[l], int(k_forward[l + 1]),
                query_bid=batch.bids[l + 1], ref_bid=batch.bids[l],
                ref_mask=batch.masks[l], method=method))
            # propagate: queries at level l, refs at level l+1
            edges_propagate.append(knn(
                batch.points[l], batch.points[l + 1], int(k_propagate[l]),
                query_bid=batch.bids[l], ref_bid=batch.bids[l + 1],
                ref_mask=batch.masks[l + 1], method=method))
    return batch.replace(
        edges_self=tuple(edges_self),
        edges_forward=tuple(edges_forward),
        edges_propagate=tuple(edges_propagate),
    )


@functools.partial(jax.jit,
                   static_argnames=("grid_sizes", "level_caps", "n_scenes",
                                    "k_self", "k_forward", "k_propagate",
                                    "method"))
def build_pyramid_packed(
    batch: PackedPyramid,
    grid_sizes: tuple,
    level_caps: tuple,
    n_scenes: int,
    k_self: tuple,
    k_forward: tuple,
    k_propagate: tuple,
    method: str = "approx",
):
    """Fully on-device pipeline: the host ships only the packed level-0 cloud
    (load + augment + finest-grid voxelize); grid subsampling of every higher
    level AND all three kNN edge sets run in one jit program on the TPU.

    The reference has no equivalent — its closest mode is post_knn, where
    subsampling still runs in CPU workers (scannet_data_loader_color_DDP.py:
    259-263) and only kNN moves to the GPU (knn_post_dataloader_utils.py).

    Returns (PackedPyramid with all levels + edges, overflow flag: True if
    any level had more voxels than its cap — result invalid, raise the caps).
    """
    points = [batch.points[0]]
    norms = [batch.norms[0]]
    masks = [batch.masks[0]]
    bids = [batch.bids[0]]
    overflow = jnp.zeros((), bool)
    for lvl in range(1, len(grid_sizes)):
        sub = grid_subsample_fixed(
            points[-1], masks[-1], float(grid_sizes[lvl]), int(level_caps[lvl]),
            features=norms[-1], bid=bids[-1], n_scenes=n_scenes)
        nrm = sub["feats"]
        nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-8)
        points.append(sub["points"])
        norms.append(nrm)
        masks.append(sub["mask"])
        bids.append(sub["bid"])
        overflow |= sub["overflow"]

    full = batch.replace(points=tuple(points), norms=tuple(norms),
                         masks=tuple(masks), bids=tuple(bids))
    full = compute_knn_packed(full, k_self, k_forward, k_propagate,
                              method=method)
    return full, overflow


def device_level_caps(cfg, cap0: int) -> tuple:
    """Per-level caps for the device pyramid: configured, or derived from the
    level-0 cap with a per-level shrink factor.

    cfg.device_cap_shrink (default 2.8) is conservative vs the ~4-8x a
    grid-size doubling gives on DENSE full scans (the trainer's
    random-voxelize path). It is WRONG for 'multiple'-mode covering sets:
    those are one-point-per-finest-voxel already, and a late (sparse)
    covering set can keep every point distinct at every coarser grid —
    measured worst-case shrink 1.0 on synth_demo voting items (the r5
    battery's vote_dev_cold overflow). The voting evaluator therefore
    derives per-batch caps from a host voxel-cascade count instead
    (eval/voting.py::_cascade_caps) and pins them via cfg.device_level_caps;
    build_pyramid_packed's overflow flag stays the loud safety net."""
    if cfg.get("device_level_caps"):
        return tuple(int(c) for c in cfg.device_level_caps)
    shrink = float(cfg.get("device_cap_shrink", 2.8))
    caps = [cap0]
    for _ in range(1, len(cfg.grid_size)):
        caps.append(max(256, -(-int(caps[-1] / shrink) // 128) * 128))
    return tuple(caps)


def prepare(batch: PackedPyramid, cfg) -> PackedPyramid:
    """Trainer-facing wrapper (API parity with knn_post_dataloader_utils.prepare).

    cfg.post_knn: edges on device. cfg.device_pyramid: subsampling AND edges
    on device (the host item carries only level 0)."""
    n = len(cfg.grid_size)

    def _k(v):
        return tuple(v) if isinstance(v, (list, tuple)) else (int(v),) * n

    if cfg.get("device_pyramid"):
        full, overflow = prepare_flagged(batch, cfg)
        if cfg.get("check_pyramid_overflow", True) and bool(overflow):
            raise ValueError(
                "device pyramid overflowed a level cap; raise "
                "cfg.device_level_caps (or MAX_POINTS_NUM)")
        return full
    return compute_knn_packed(batch, _k(cfg.get("K_self", 16)),
                              _k(cfg.get("K_forward", 16)),
                              _k(cfg.get("K_propagate", 16)),
                              method=cfg.get("knn_method", "approx"))


def prepare_flagged(batch: PackedPyramid, cfg):
    """Device-pyramid build WITHOUT the host-synced overflow check: returns
    (full_batch, overflow_flag) with the flag still on device. Traceable —
    callers that fuse the pyramid build with the model forward into one jit
    (eval/voting.py: one dispatch per chunk instead of ~10, which is the
    wall on relay-attached chips) check the flag after the fused call."""
    n = len(cfg.grid_size)

    def _k(v):
        return tuple(v) if isinstance(v, (list, tuple)) else (int(v),) * n

    cap0 = batch.points[0].shape[0]
    return build_pyramid_packed(
        batch, tuple(float(g) for g in cfg.grid_size),
        device_level_caps(cfg, cap0), int(cfg.BATCH_SIZE),
        _k(cfg.get("K_self", 16)), _k(cfg.get("K_forward", 16)),
        _k(cfg.get("K_propagate", 16)),
        method=cfg.get("knn_method", "approx"))
