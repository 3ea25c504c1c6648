"""Native C++ preprocessing kernels vs numpy/scipy oracles.

Mirrors the reference's nanoflann-vs-sklearn parity test
(cpp_wrappers/cpp_neighbors/test.py). Distances are compared, not indices
(tie-breaking is implementation-defined).
"""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from pcf_tpu import native
from pcf_tpu.ops.subsample import grid_subsampling as np_gs

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="no C++ toolchain for the native lib")


def _sorted_rows(x):
    return x[np.lexsort(np.round(x, 5).T[::-1])]


def test_native_grid_subsample_matches_numpy(rng):
    pts = rng.uniform(0, 3, (5000, 3)).astype(np.float32)
    feats = rng.normal(size=(5000, 4)).astype(np.float32)
    labels = rng.integers(0, 7, 5000).astype(np.int32)
    sp, sf, sl = native.grid_subsample(pts, feats, labels, 0.25)
    op, of, ol = np_gs(pts, feats, labels, sampleDl=0.25)
    assert sp.shape == op.shape
    np.testing.assert_allclose(_sorted_rows(sp), _sorted_rows(op), atol=1e-4)
    # feature means travel with their voxel: match rows via nearest barycenter
    order_n = np.lexsort(np.round(sp, 5).T[::-1])
    order_o = np.lexsort(np.round(op, 5).T[::-1])
    np.testing.assert_allclose(sf[order_n], of[order_o], atol=1e-4)
    np.testing.assert_array_equal(sl[order_n], ol[order_o])


def test_native_grid_subsample_points_only(rng):
    pts = rng.uniform(-2, 2, (3000, 3)).astype(np.float32)
    sp = native.grid_subsample(pts, sample_dl=0.3)
    op = np_gs(pts, sampleDl=0.3)
    assert sp.shape == op.shape
    np.testing.assert_allclose(_sorted_rows(sp), _sorted_rows(op), atol=1e-4)


def test_native_knn_matches_scipy(rng):
    ref = rng.normal(size=(4000, 3)).astype(np.float32)
    q = rng.normal(size=(500, 3)).astype(np.float32)
    idx = native.knn(ref, q, 8)
    d_native = ((q[:, None, :] - ref[idx]) ** 2).sum(-1)
    d_scipy, _ = cKDTree(ref).query(q, k=8)
    np.testing.assert_allclose(np.sort(d_native, 1), d_scipy ** 2, atol=1e-4)
    # ascending order
    assert np.all(np.diff(d_native, axis=1) >= -1e-5)


def test_native_knn_self_first(rng):
    pts = rng.normal(size=(1000, 3)).astype(np.float32)
    idx = native.knn(pts, pts, 4)
    np.testing.assert_array_equal(idx[:, 0], np.arange(1000))


def test_native_knn_batch_offsets(rng):
    """Packed-batch kNN stays within each cloud and offsets indices
    (contract of cpp_neighbors batch_kquery, wrapper.cpp:35)."""
    a = rng.normal(size=(300, 3)).astype(np.float32)
    b = 100 + rng.normal(size=(200, 3)).astype(np.float32)
    refs = np.concatenate([a, b])
    queries = refs.copy()
    idx = native.knn_batch(queries, refs, [300, 200], [300, 200], 5)
    assert idx[:300].max() < 300
    assert idx[300:].min() >= 300
