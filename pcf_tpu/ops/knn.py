"""Brute-force kNN as tiled distance rows + top-k.

TPU-native replacement for the reference's CPU nanoflann KD-trees
(cpp_wrappers/cpp_neighbors/neighbors.cpp:339-443), sklearn KDTree
(datasetCommon.py:93-133) and the on-GPU KeOps/cuVS path
(knn_post_dataloader_utils.py:10-41). One implementation serves both the
input pipeline (jit on CPU) and on-device post-batching kNN (the `post_knn`
path), and works directly on the packed multi-cloud layout via per-point
batch ids — neighbors never cross cloud boundaries.

Design notes (static shapes, XLA-friendly):
  * the matmul expansion alone would lose ~1e-3 absolute precision to
    cancellation (breaking the self-first invariant of self-edges, whose
    distance must be exactly 0) — hence the exact re-rank stage;
  * two stages per query tile: a coarse MXU ranking (score 2 q.r - |r|^2,
    monotone in -d, one matmul instead of D elementwise [q_tile, N] passes)
    selects k+16 candidates, then an exact diff-form re-rank restores true
    distances — self-edges are exactly 0 and stay first. 60x faster than
    the original diff-form row build at N=81920 (11.2 s -> 0.26-0.84 s);
  * method='approx' uses lax.approx_max_k (TPU-optimized partial reduction,
    recall ~0.997 at k=16/N=40k) for a further ~2x; the global max (self)
    always survives, so self-edges keep self first;
  * invalid refs (padding or different cloud) get +BIG distance; queries
    with < k valid refs fall back to their nearest valid ref (reference
    samples random indices in that case, datasetCommon.py:108-114).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# plain float (not jnp scalar): module import must not initialize a backend
_BIG = 1e10
# cap on the [q_tile, N] distance row (f32 elements) per map step.
# Keep tiles big: many small top_k calls are far slower than few big ones
# (measured 20x on v5e); 256M elements = a 1GB f32 row buffer.
_ROW_BUDGET = 256 * 1024 * 1024


def _pad_rows(x: jnp.ndarray, n: int, value=0):
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("k", "q_tile", "method", "return_dist")
)
def knn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    *,
    query_bid: jnp.ndarray | None = None,
    ref_bid: jnp.ndarray | None = None,
    ref_mask: jnp.ndarray | None = None,
    q_tile: int = 512,
    method: str = "exact",
    return_dist: bool = False,
):
    """k-nearest-neighbors of `query` among `ref` (squared-L2 metric).

    Args:
      query: [M, D] query points.
      ref: [N, D] reference points.
      k: number of neighbors.
      query_bid / ref_bid: optional [M] / [N] int cloud ids for packed batches;
        a neighbor is only valid if ids match.
      ref_mask: optional [N] bool validity mask for refs (padding rows False).
      q_tile: query tile size (shrunk automatically for huge N).
      method: 'exact' (lax.top_k) or 'approx' (lax.approx_max_k, ~0.997
        recall, ~2x faster).
      return_dist: also return the squared distances [M, k].

    Returns:
      idx [M, k] int32, sorted by ascending distance (self first for
      self-queries), and dists [M, k] float32 if return_dist.
    """
    M, D = query.shape
    N = ref.shape[0]
    # keep the [q_tile, N] row within budget
    while q_tile > 256 and q_tile * N > _ROW_BUDGET:
        q_tile //= 2
    q_tile = min(q_tile, max(8, M))
    Mp = -(-M // q_tile) * q_tile

    qf = _pad_rows(query.astype(jnp.float32), Mp)
    rf = ref.astype(jnp.float32)

    r_invalid = jnp.zeros((N,), bool)
    if ref_mask is not None:
        r_invalid = ~ref_mask.astype(bool)
    rbid = ref_bid.astype(jnp.int32) if ref_bid is not None else None
    if query_bid is not None:
        qbid = _pad_rows(query_bid.astype(jnp.int32), Mp, value=-2)
    else:
        qbid = jnp.zeros((Mp,), jnp.int32)

    num_q_tiles = Mp // q_tile
    # Candidate count for the exact re-rank stage: the coarse MXU score
    # mis-ranks only near-ties (f32 rounding of 2 q.r ~ 1e-3 absolute at
    # ~10m scene scale), so a margin of 16 makes a true top-k neighbor
    # falling outside the candidate set practically impossible.
    kc = min(N, k + 16)
    rr = jnp.sum(rf * rf, axis=1)  # [N]

    def per_tile(tile_args):
        q, qb = tile_args
        # Stage 1 — coarse ranking on the MXU: score = 2 q.r^T - |r|^2 is
        # monotone in -|q - r|^2 (the |q|^2 term is constant per row). One
        # [qt, D] x [D, N] matmul replaces D elementwise [qt, N] passes —
        # the old diff-form build was HBM-bound (11.2 s at N=81920; this
        # formulation measures ~60x faster end-to-end).
        qr = lax.dot_general(q, rf, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)
        s = 2.0 * qr - rr[None, :]
        invalid = r_invalid[None, :]
        if rbid is not None:
            invalid = invalid | (qb[:, None] != rbid[None, :])
        s = jnp.where(invalid, -_BIG, s)
        if method == "approx":
            _, cand = lax.approx_max_k(s, kc, recall_target=0.99)
        else:
            _, cand = lax.top_k(s, kc)
        cand = cand.astype(jnp.int32)

        # Stage 2 — exact re-rank of the kc candidates with the
        # cancellation-free diff form: restores exact distances (self-edges
        # are exactly 0 and stay first) at negligible cost.
        cpts = jnp.take(rf, cand, axis=0, mode="clip")      # [qt, kc, D]
        d = jnp.sum((cpts - q[:, None, :]) ** 2, axis=-1)   # [qt, kc]
        cand_invalid = jnp.take(r_invalid, cand, mode="clip")
        if rbid is not None:
            cand_invalid = cand_invalid | (
                qb[:, None] != jnp.take(rbid, cand, mode="clip"))
        neg = jnp.where(cand_invalid, -_BIG, -d)
        best_neg, sel = lax.top_k(neg, k)
        best_idx = jnp.take_along_axis(cand, sel, axis=1)
        # Fallback for queries with < k valid refs: clamp to the nearest
        # valid neighbor. CAVEAT: a query whose scene has ZERO valid refs
        # (possible only for padding rows, whose bid=-1 matches no ref) gets
        # the arbitrary argmax of an all-invalid row — callers MUST mask
        # padded queries downstream and never consume their edges unmasked.
        have = best_neg > -_BIG
        best_idx = jnp.where(have, best_idx, best_idx[:, :1])
        best_neg = jnp.where(have, best_neg,
                             jnp.broadcast_to(best_neg[:, :1], best_neg.shape))
        return best_neg, best_idx

    q_tiles = qf.reshape(num_q_tiles, q_tile, D)
    qb_tiles = qbid.reshape(num_q_tiles, q_tile)
    neg, idx = lax.map(per_tile, (q_tiles, qb_tiles))
    idx = idx.reshape(Mp, k)[:M]
    if return_dist:
        return idx, (-neg.reshape(Mp, k))[:M]
    return idx


def knn_packed(
    points: jnp.ndarray,
    bids: jnp.ndarray,
    mask: jnp.ndarray,
    k: int,
    query_points: jnp.ndarray | None = None,
    query_bids: jnp.ndarray | None = None,
    **kwargs,
) -> jnp.ndarray:
    """kNN over a packed multi-cloud batch (replacement for
    knn_post_dataloader_utils.compute_knn_packed, reference :171-223).

    If query_points is None, computes self-edges within `points`.
    """
    if query_points is None:
        query_points, query_bids = points, bids
    return knn(
        query_points,
        points,
        k,
        query_bid=query_bids,
        ref_bid=bids,
        ref_mask=mask,
        **kwargs,
    )
