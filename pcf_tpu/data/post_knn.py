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

from pcf_tpu.core.batching import PackedPyramid
from pcf_tpu.ops.knn import knn


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


def prepare(batch: PackedPyramid, cfg) -> PackedPyramid:
    """Trainer-facing wrapper (API parity with knn_post_dataloader_utils.prepare)."""
    n = batch.num_levels

    def _k(v):
        return tuple(v) if isinstance(v, (list, tuple)) else (int(v),) * n

    return compute_knn_packed(batch, _k(cfg.get("K_self", 16)),
                              _k(cfg.get("K_forward", 16)),
                              _k(cfg.get("K_propagate", 16)),
                              method=cfg.get("knn_method", "approx"))
