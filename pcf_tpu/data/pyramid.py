"""Host-side multi-resolution pyramid builder.

Per-scene grid subsampling + kNN graph construction for the input pipeline,
mirroring the reference's datasetCommon.py:384-483 (subsample,
subsample_and_knn) and compute_knn (:93-133). Host kNN uses scipy's cKDTree
(the reference used sklearn KDTree / nanoflann); the on-device path uses
pcf_tpu.ops.knn instead (the post_knn analog).
"""

from __future__ import annotations

import os

import numpy as np
from scipy.spatial import cKDTree

from pcf_tpu import native
from pcf_tpu.ops.subsample import grid_subsampling as _np_grid_subsampling

# The native C++ path (pcf_tpu/native) is the default when it builds; set
# PCF_NO_NATIVE=1 to force the numpy/scipy fallback.
_USE_NATIVE = os.environ.get("PCF_NO_NATIVE") != "1" and native.is_available()


def grid_subsampling(points, features=None, labels=None, sampleDl=0.1, verbose=0):
    """Voxel-barycenter subsampling: native C++ hash-map kernel when built,
    numpy segment reductions otherwise. Identical outputs up to voxel order."""
    if _USE_NATIVE:
        return native.grid_subsample(points, features, labels, sampleDl)
    return _np_grid_subsampling(points, features, labels, sampleDl, verbose)


def compute_knn(
    ref_points: np.ndarray,
    query_points: np.ndarray,
    K: int,
    dilated_rate: int = 1,
    rng: np.random.Generator | None = None,
) -> np.ndarray:
    """K nearest neighbors of each query among refs (reference: datasetCommon.py:93-133).

    With dilated_rate > 1 selects every dilated_rate-th of K*dilated_rate
    neighbors (Dilated Point Convolutions, Engelmann et al. ICRA 2020).
    Falls back to random indices when there are too few reference points,
    matching the reference (:108-114).
    """
    num_ref = ref_points.shape[0]
    if num_ref < K or num_ref < dilated_rate * K:
        rng = rng or np.random.default_rng()
        return rng.integers(0, num_ref, size=(query_points.shape[0], K)).astype(np.int32)
    if _USE_NATIVE:
        idx = native.knn(ref_points, query_points, K * dilated_rate)
    else:
        tree = cKDTree(ref_points)
        _, idx = tree.query(query_points, k=K * dilated_rate)
        if K * dilated_rate == 1:
            idx = idx[:, None]
    if dilated_rate > 1:
        idx = idx[:, ::dilated_rate]
    return np.ascontiguousarray(idx, dtype=np.int32)


def subsample(coord: np.ndarray, norm: np.ndarray, grid_size=(0.1,)):
    """Grid-subsample each pyramid level without kNN (reference: datasetCommon.py:384-420).
    Used by the post_knn path where edges are built on device after batching."""
    point_list, norm_list = [], []
    for j, grid_s in enumerate(grid_size):
        if j == 0:
            point_list.append(coord.astype(np.float32))
            norm_list.append(norm.astype(np.float32))
        else:
            sub_point, sub_norm = grid_subsampling(
                point_list[-1], features=norm_list[-1], sampleDl=grid_s)
            if sub_point.shape[0] <= 16:  # too few points: keep previous level
                sub_point, sub_norm = point_list[-1], norm_list[-1]
            point_list.append(sub_point)
            norm_list.append(sub_norm)
    return point_list, norm_list


def subsample_and_knn(
    coord: np.ndarray,
    norm: np.ndarray,
    grid_size=(0.1,),
    K_self=16,
    K_forward=16,
    K_propagate=16,
    rng: np.random.Generator | None = None,
    morton: bool = False,
):
    """Build the full pyramid + the three kNN edge sets per level
    (reference: datasetCommon.py:423-483).

    Returns point_list, nei_forward_list, nei_propagate_list, nei_self_list,
    norm_list — identical structure to the reference.

    morton=True sorts every level into Z-order before edges are built (point
    sets are order-free, so this changes nothing semantically). Spatial
    neighbors then sit close in row index, which is what makes the windowed
    dedup gather (ops/window.py) hold its per-tile window bound. Level 0 is
    sorted by the caller (scene_to_item) so features/labels follow the same
    permutation.
    """
    if isinstance(K_self, int):
        K_self = [K_self] * len(grid_size)
    if isinstance(K_forward, int):
        K_forward = [K_forward] * len(grid_size)
    if isinstance(K_propagate, int):
        K_propagate = [K_propagate] * len(grid_size)

    point_list, norm_list = [], []
    nei_forward_list, nei_propagate_list, nei_self_list = [], [], []

    for j, grid_s in enumerate(grid_size):
        if j == 0:
            sub_point = coord.astype(np.float32)
            sub_norm = norm.astype(np.float32)
            point_list.append(sub_point)
            norm_list.append(sub_norm)
            nei_self_list.append(compute_knn(sub_point, sub_point, K_self[j], rng=rng))
        else:
            sub_point, sub_norm = grid_subsampling(
                point_list[-1], features=norm_list[-1], sampleDl=grid_s)
            if sub_point.shape[0] <= K_self[j]:
                sub_point, sub_norm = point_list[-1], norm_list[-1]
            elif morton:
                from pcf_tpu.ops.window import morton_argsort

                perm = morton_argsort(sub_point)
                sub_point, sub_norm = sub_point[perm], sub_norm[perm]

            nei_forward_list.append(
                compute_knn(point_list[-1], sub_point, K_forward[j], rng=rng))
            nei_propagate_list.append(
                compute_knn(sub_point, point_list[-1], K_propagate[j], rng=rng))
            nei_self_list.append(compute_knn(sub_point, sub_point, K_self[j], rng=rng))

            point_list.append(sub_point)
            norm_list.append(sub_norm)

    return point_list, nei_forward_list, nei_propagate_list, nei_self_list, norm_list


def scene_to_item(coord, norm, feats, labels, grid_size, K_self=16,
                  K_forward=16, K_propagate=16, rng=None,
                  morton: bool = False) -> dict:
    """Build one dataloader item dict (keys match the reference's dataset items,
    scannet_data_loader_color_DDP.py:267-281)."""
    if morton:
        from pcf_tpu.ops.window import morton_argsort

        perm = morton_argsort(coord)
        coord, norm, feats = coord[perm], norm[perm], feats[perm]
        if labels is not None:
            labels = np.asarray(labels)[perm]
    point_list, nf, npg, ns, norm_list = subsample_and_knn(
        coord, norm, grid_size, K_self, K_forward, K_propagate, rng=rng,
        morton=morton)
    item = {
        "point_list": point_list,
        "surface_normal_list": norm_list,
        "feature_list": feats.astype(np.float32),
        "nei_forward_list": nf,
        "nei_propagate_list": npg,
        "nei_self_list": ns,
    }
    if labels is not None:
        item["label_list"] = labels.astype(np.int32)
    return item
