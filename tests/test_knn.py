"""kNN op tests vs numpy brute-force oracle.

Parity compares distances, not indices: tie-breaking among equidistant
neighbors is implementation-defined (SURVEY.md §7 hard parts).
"""

import jax.numpy as jnp
import numpy as np

from pcf_tpu.ops import knn, knn_packed


def _np_knn_dists(query, ref, k, q_bid=None, r_bid=None, r_mask=None):
    d = ((query[:, None, :] - ref[None, :, :]) ** 2).sum(-1)
    if r_mask is not None:
        d[:, ~r_mask] = np.inf
    if q_bid is not None:
        d[q_bid[:, None] != r_bid[None, :]] = np.inf
    return np.sort(d, axis=1)[:, :k]


def test_knn_matches_bruteforce(rng):
    q = rng.normal(size=(101, 3)).astype(np.float32)
    r = rng.normal(size=(257, 3)).astype(np.float32)
    idx, dist = knn(jnp.asarray(q), jnp.asarray(r), 8, q_tile=32,
                    return_dist=True)
    expected = _np_knn_dists(q, r, 8)
    np.testing.assert_allclose(np.asarray(dist), expected, atol=1e-4)
    # indices must actually produce those distances
    d_from_idx = ((q[:, None, :] - r[np.asarray(idx)]) ** 2).sum(-1)
    np.testing.assert_allclose(np.sort(d_from_idx, 1), expected, atol=1e-4)


def test_knn_self_first():
    """Self-edges: each point's nearest neighbor is itself (distance 0),
    matching sklearn KDTree behavior used by the reference (datasetCommon.py:115-120)."""
    rng = np.random.default_rng(3)
    pts = rng.normal(size=(50, 3)).astype(np.float32)
    idx = knn(jnp.asarray(pts), jnp.asarray(pts), 4, q_tile=16)
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], np.arange(50))


def test_knn_respects_batch_ids(rng):
    """Packed batches: neighbors never cross cloud boundaries
    (replaces per-cloud KD-trees, neighbors.cpp:339-443)."""
    pts = rng.normal(size=(60, 3)).astype(np.float32)
    bids = np.repeat(np.arange(3), 20).astype(np.int32)
    idx = knn_packed(jnp.asarray(pts), jnp.asarray(bids), jnp.ones(60, bool), 5,
                     q_tile=16)
    idx = np.asarray(idx)
    for i in range(60):
        assert np.all(bids[idx[i]] == bids[i]), i


def test_knn_respects_mask(rng):
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    mask = np.ones(40, bool)
    mask[25:] = False
    idx = knn(jnp.asarray(pts[:10]), jnp.asarray(pts), 6, ref_mask=jnp.asarray(mask),
              q_tile=8)
    assert np.asarray(idx).max() < 25


def test_knn_fewer_refs_than_k(rng):
    """With < k valid refs, neighbors repeat valid indices (never padding)."""
    pts = rng.normal(size=(16, 3)).astype(np.float32)
    mask = np.zeros(16, bool)
    mask[:3] = True
    idx = knn(jnp.asarray(pts[:4]), jnp.asarray(pts), 8, ref_mask=jnp.asarray(mask),
              q_tile=8)
    assert np.asarray(idx).max() < 3


def test_knn_dists_sorted(rng):
    q = rng.normal(size=(33, 3)).astype(np.float32)
    r = rng.normal(size=(77, 3)).astype(np.float32)
    _, dist = knn(jnp.asarray(q), jnp.asarray(r), 9, q_tile=16,
                  return_dist=True)
    d = np.asarray(dist)
    assert np.all(np.diff(d, axis=1) >= -1e-5)
