"""Scene-level data-pipeline equivalence against the reference's OWN code.

Runs one synthetic surface-like scene through the reference's
`datasetCommon.subsample_and_knn` (sklearn-KDTree branch, needs no CUDA;
its grid subsampling is the reference's cpp_subsampling extension compiled
out-of-tree by tests/ref_build/build_oracle.py) and through the rebuild's
`pcf_tpu.data.pyramid.subsample_and_knn`, then asserts at every pyramid
level:

  * the subsampled point sets are identical (voxel-barycenter positions,
    matched by nearest-neighbor assignment — voxel ORDER is hash-map
    dependent and differs legitimately),
  * the voxel-averaged surface normals agree under that matching,
  * all three kNN edge sets (self / forward / propagate) have identical
    neighbor DISTANCE multisets per query (indices may differ on exact
    distance ties; distances may not).

This closes the "remaining mIoU risk is down to data-pipeline equivalence"
gap: weight-transplant tests (test_reference_parity.py) pin the model math,
this pins what the model is fed. Reference: datasetCommon.py:423-483
(subsample_and_knn), :93-133 (compute_knn), :17-67 (grid_subsampling).
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest
from scipy.spatial import cKDTree

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.join(HERE, ".."))

from pcf_tpu.data.synthetic import synthetic_scene  # noqa: E402

REF_PATH = "/root/reference"

GRID = [0.05, 0.1, 0.2, 0.4, 0.8]
K = [16, 16, 16, 16, 16]


def _load_ref_datasetCommon():
    """Import the reference's datasetCommon with its native/keops deps
    satisfied: the out-of-tree-built cpp_subsampling oracle is injected under
    the package name the reference imports, and the keops-based post-loader
    module (unused by subsample_and_knn) is stubbed."""
    sys.path.insert(0, os.path.join(HERE, "ref_build"))
    from build_oracle import load_oracle

    oracle = load_oracle()
    if oracle is None:
        pytest.skip("reference cpp_subsampling oracle could not be built")

    for name in ("cpp_wrappers", "cpp_wrappers.cpp_subsampling"):
        sys.modules.setdefault(name, types.ModuleType(name))
    sys.modules["cpp_wrappers.cpp_subsampling.grid_subsampling"] = oracle

    stub = types.ModuleType("knn_post_dataloader_utils")
    stub.knn_keops = None  # only the post-dataloader GPU path uses it
    sys.modules.setdefault("knn_post_dataloader_utils", stub)

    sys.path.insert(0, REF_PATH)
    import datasetCommon

    return datasetCommon


def _match_point_sets(ref_pts, our_pts, tol=1e-5):
    """Nearest-neighbor assignment our->ref; asserts it is a bijection with
    per-point distance < tol. Returns perm with ref_pts[perm[i]] ~ our_pts[i].
    """
    assert ref_pts.shape == our_pts.shape, (ref_pts.shape, our_pts.shape)
    d, idx = cKDTree(ref_pts).query(our_pts, k=1)
    assert float(d.max()) < tol, f"point sets differ: max NN dist {d.max()}"
    assert len(np.unique(idx)) == len(idx), "point matching is not a bijection"
    return idx


def _edge_dists(query_pts, ref_pts, nei):
    """Sorted per-query neighbor-distance vectors [Q, K]."""
    d = np.linalg.norm(ref_pts[nei] - query_pts[:, None, :], axis=-1)
    return np.sort(d, axis=1)


@pytest.fixture(scope="module")
def scene():
    coord, norm, _, _ = synthetic_scene(30000, extent=6.0, seed=7)
    # unit normals, like ScanNet preprocessing (open3d estimate_normals)
    norm = norm / np.maximum(np.linalg.norm(norm, axis=1, keepdims=True), 1e-12)
    return coord, norm


@pytest.fixture(scope="module")
def ref_pyramid(scene):
    dc = _load_ref_datasetCommon()
    coord, norm = scene
    return dc.subsample_and_knn(coord, norm, grid_size=GRID, K_self=K,
                                K_forward=K, K_propagate=K)


@pytest.fixture(scope="module", params=["host", "native"])
def our_pyramid(request, scene, monkeypatch_module):
    """Both our host (numpy+cKDTree) and native (C++ KD-tree/voxel-hash)
    builders must match the reference."""
    from pcf_tpu import native
    from pcf_tpu.data import pyramid

    if request.param == "native" and not native.is_available():
        pytest.skip("native library not built")
    monkeypatch_module.setattr(
        pyramid, "_USE_NATIVE", request.param == "native")
    coord, norm = scene
    return pyramid.subsample_and_knn(coord, norm, grid_size=GRID, K_self=K,
                                     K_forward=K, K_propagate=K)


@pytest.fixture(scope="module")
def monkeypatch_module():
    mp = pytest.MonkeyPatch()
    yield mp
    mp.undo()


def test_pyramid_points_and_normals_match(ref_pyramid, our_pyramid):
    ref_pts, _, _, _, ref_norms = ref_pyramid
    our_pts, _, _, _, our_norms = our_pyramid
    assert len(ref_pts) == len(our_pts) == len(GRID)
    for lvl in range(len(GRID)):
        perm = _match_point_sets(ref_pts[lvl], our_pts[lvl])
        np.testing.assert_allclose(
            ref_norms[lvl][perm], our_norms[lvl], atol=1e-5,
            err_msg=f"voxel-averaged normals differ at level {lvl}")


def test_pyramid_knn_distances_match(ref_pyramid, our_pyramid):
    ref_pts, ref_fwd, ref_prop, ref_self, _ = ref_pyramid
    our_pts, our_fwd, our_prop, our_self, _ = our_pyramid
    perms = [_match_point_sets(ref_pts[lvl], our_pts[lvl])
             for lvl in range(len(GRID))]
    for lvl in range(len(GRID)):
        rd = _edge_dists(ref_pts[lvl], ref_pts[lvl], ref_self[lvl])
        od = _edge_dists(our_pts[lvl], our_pts[lvl], our_self[lvl])
        np.testing.assert_allclose(rd[perms[lvl]], od, atol=1e-5,
                                   err_msg=f"self-kNN differs at level {lvl}")
    for j in range(len(GRID) - 1):
        # forward: queries at level j+1, refs at level j
        rd = _edge_dists(ref_pts[j + 1], ref_pts[j], ref_fwd[j])
        od = _edge_dists(our_pts[j + 1], our_pts[j], our_fwd[j])
        np.testing.assert_allclose(rd[perms[j + 1]], od, atol=1e-5,
                                   err_msg=f"forward kNN differs at level {j}")
        # propagate: queries at level j, refs at level j+1
        rd = _edge_dists(ref_pts[j], ref_pts[j + 1], ref_prop[j])
        od = _edge_dists(our_pts[j], our_pts[j + 1], our_prop[j])
        np.testing.assert_allclose(
            rd[perms[j]], od, atol=1e-5,
            err_msg=f"propagate kNN differs at level {j}")


def test_level_counts_shrink(ref_pyramid):
    """Sanity: the synthetic scene actually exercises 5 distinct levels."""
    pts = ref_pyramid[0]
    ns = [p.shape[0] for p in pts]
    assert all(a > b for a, b in zip(ns, ns[1:])), ns
