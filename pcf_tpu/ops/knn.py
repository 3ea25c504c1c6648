"""Brute-force kNN as tiled distance matrices + running top-k.

TPU-native replacement for the reference's CPU nanoflann KD-trees
(cpp_wrappers/cpp_neighbors/neighbors.cpp:339-443), sklearn KDTree
(datasetCommon.py:93-133) and the on-GPU KeOps/cuVS path
(knn_post_dataloader_utils.py:10-41). One implementation serves both the
input pipeline (jit on CPU) and on-device post-batching kNN (the `post_knn`
path), and works directly on the packed multi-cloud layout via per-point
batch ids — neighbors never cross cloud boundaries.

Design notes (static shapes, XLA-friendly):
  * query dim is tiled with `lax.map` (sequential), ref dim with `lax.scan`;
    only a [q_tile, ref_chunk] distance tile is ever live, so nothing of
    O(M*N) touches HBM.
  * the running top-k is merged per chunk with `lax.top_k` over the
    concatenation [best | chunk]; ties prefer earlier candidates, so results
    are sorted by ascending distance with self first for self-edges.
  * invalid refs (padding or different cloud) get +BIG distance. If a query
    has fewer than k valid refs, trailing neighbors fall back to the nearest
    valid ref (reference instead samples random indices when num_ref < K,
    datasetCommon.py:108-114 — any valid index is equally arbitrary there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

# plain float (not jnp scalar): module import must not initialize a backend
_BIG = 1e10


def _pad_rows(x: jnp.ndarray, n: int, value=0):
    pad = [(0, n - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=value)


@functools.partial(
    jax.jit, static_argnames=("k", "q_tile", "ref_chunk", "return_dist")
)
def knn(
    query: jnp.ndarray,
    ref: jnp.ndarray,
    k: int,
    *,
    query_bid: jnp.ndarray | None = None,
    ref_bid: jnp.ndarray | None = None,
    ref_mask: jnp.ndarray | None = None,
    q_tile: int = 4096,
    ref_chunk: int = 2048,
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
      q_tile / ref_chunk: tiling parameters (VMEM working-set control).
      return_dist: also return the squared distances [M, k].

    Returns:
      idx [M, k] int32 (and dists [M, k] float32 if return_dist).
    """
    M, D = query.shape
    N = ref.shape[0]
    q_tile = min(q_tile, max(8, M))
    ref_chunk = min(ref_chunk, max(8, N))

    Mp = -(-M // q_tile) * q_tile
    Np = -(-N // ref_chunk) * ref_chunk

    qf = _pad_rows(query.astype(jnp.float32), Mp)
    rf = _pad_rows(ref.astype(jnp.float32), Np)

    r_valid = jnp.arange(Np) < N
    if ref_mask is not None:
        r_valid = r_valid & _pad_rows(ref_mask.astype(bool), Np)
    if ref_bid is not None:
        rbid = _pad_rows(ref_bid.astype(jnp.int32), Np, value=-1)
    else:
        rbid = None
    if query_bid is not None:
        qbid = _pad_rows(query_bid.astype(jnp.int32), Mp, value=-2)
    else:
        qbid = None

    num_q_tiles = Mp // q_tile
    num_chunks = Np // ref_chunk

    r_chunks = rf.reshape(num_chunks, ref_chunk, D)
    rv_chunks = r_valid.reshape(num_chunks, ref_chunk)
    rb_chunks = rbid.reshape(num_chunks, ref_chunk) if rbid is not None else None
    base_idx = (jnp.arange(num_chunks, dtype=jnp.int32) * ref_chunk)[:, None] + jnp.arange(
        ref_chunk, dtype=jnp.int32
    )[None, :]

    def per_tile(tile_args):
        q, qb = tile_args
        q_sq = jnp.sum(q * q, axis=-1, keepdims=True)  # [qt, 1]

        def body(carry, chunk):
            best_neg, best_idx = carry
            r, rv, rb, bidx = chunk
            r_sq = jnp.sum(r * r, axis=-1)  # [rc]
            # d^2 = |q|^2 - 2 q.r + |r|^2, the q.r term rides the MXU.
            # full-f32 matmul: default (bf16-ish) precision corrupts distances
            d = (
                q_sq
                - 2.0 * jnp.dot(q, r.T, preferred_element_type=jnp.float32,
                                precision=lax.Precision.HIGHEST)
                + r_sq[None, :]
            )
            invalid = ~rv[None, :]
            if rb is not None:
                invalid = invalid | (qb[:, None] != rb[None, :])
            neg = jnp.where(invalid, -_BIG, -d)
            cand_neg = jnp.concatenate([best_neg, neg], axis=1)
            cand_idx = jnp.concatenate(
                [best_idx, jnp.broadcast_to(bidx[None, :], neg.shape)], axis=1
            )
            new_neg, sel = lax.top_k(cand_neg, k)
            new_idx = jnp.take_along_axis(cand_idx, sel, axis=1)
            return (new_neg, new_idx), None

        init = (
            jnp.full((q.shape[0], k), -_BIG * 2, dtype=jnp.float32),
            jnp.zeros((q.shape[0], k), dtype=jnp.int32),
        )
        chunks = (r_chunks, rv_chunks, rb_chunks, base_idx)
        (best_neg, best_idx), _ = lax.scan(body, init, chunks)
        # Fallback for queries with < k valid refs: clamp to nearest valid.
        have = best_neg > -_BIG
        nearest = best_idx[:, :1]
        best_idx = jnp.where(have, best_idx, nearest)
        best_neg = jnp.where(have, best_neg, jnp.broadcast_to(best_neg[:, :1], best_neg.shape))
        return best_neg, best_idx

    q_tiles = qf.reshape(num_q_tiles, q_tile, D)
    qb_tiles = (
        qbid.reshape(num_q_tiles, q_tile)
        if qbid is not None
        else jnp.zeros((num_q_tiles, q_tile), dtype=jnp.int32)
    )
    neg, idx = lax.map(per_tile, (q_tiles, qb_tiles))
    idx = idx.reshape(Mp, k)[:M]
    if return_dist:
        d = (-neg.reshape(Mp, k))[:M]
        return idx, d
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
