"""Hash-based voxelization (host-side, numpy).

Functional re-implementation of the reference's util/voxelize.py:10-82.
Runs in the input pipeline (host), selecting at most one point per voxel
('random' / 'deterministic') or covering sets ('multiple', used by the
voting evaluator so every raw point is predicted at least once).
"""

from __future__ import annotations

import numpy as np


def fnv_hash_vec(arr: np.ndarray) -> np.ndarray:
    """FNV64-1A hash of integer coordinate rows (reference: util/voxelize.py:10-22)."""
    assert arr.ndim == 2
    arr = arr.copy().astype(np.uint64, copy=False)
    hashed = np.uint64(14695981039346656037) * np.ones(arr.shape[0], dtype=np.uint64)
    for j in range(arr.shape[1]):
        hashed *= np.uint64(1099511628211)
        hashed = np.bitwise_xor(hashed, arr[:, j])
    return hashed


def ravel_hash_vec(arr: np.ndarray) -> np.ndarray:
    """Fortran-order ravel of min-shifted coordinates (reference: util/voxelize.py:25-41)."""
    assert arr.ndim == 2
    arr = arr.copy()
    arr -= arr.min(0)
    arr = arr.astype(np.uint64, copy=False)
    arr_max = arr.max(0).astype(np.uint64) + 1

    keys = np.zeros(arr.shape[0], dtype=np.uint64)
    for j in range(arr.shape[1] - 1):
        keys += arr[:, j]
        keys *= arr_max[j + 1]
    keys += arr[:, -1]
    return keys


def voxelize(
    coord: np.ndarray,
    voxel_size: float | np.ndarray = 0.05,
    hash_type: str = "fnv",
    mode: str = "random",
    rng: np.random.Generator | None = None,
):
    """Select representative point indices per voxel (reference: util/voxelize.py:44-82).

    mode='random': one uniformly random point per voxel (training).
    mode='deterministic': the first point (by hash sort) per voxel.
    mode='multiple': a list of index sets that jointly cover every point
      (evaluation; set i holds the i%count-th point of each voxel).
    """
    discrete_coord = np.floor(coord / np.array(voxel_size))
    if hash_type == "ravel":
        key = ravel_hash_vec(discrete_coord)
    else:
        key = fnv_hash_vec(discrete_coord)

    idx_sort = np.argsort(key)
    key_sort = key[idx_sort]
    _, count = np.unique(key_sort, return_counts=True)
    starts = np.cumsum(np.insert(count, 0, 0))[:-1]
    if mode == "deterministic":
        return idx_sort[starts]
    elif mode == "multiple":
        idx_data = []
        for i in range(count.max()):
            idx_data.append(idx_sort[starts + i % count])
        return idx_data
    else:  # 'random'
        rng = rng or np.random.default_rng()
        offs = rng.integers(0, count.max(), size=count.size) % count
        return idx_sort[starts + offs]
