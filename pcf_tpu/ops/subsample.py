"""Voxel-grid barycenter subsampling.

Replacement for the reference's C++ CPU extension
(cpp_wrappers/cpp_subsampling/grid_subsampling/grid_subsampling.cpp:57-107),
which hashes each point into a voxel and emits per-voxel barycenters, feature
means, and majority labels. Two implementations:

  * `grid_subsampling` — vectorized numpy for the host input pipeline
    (replaces the per-scene C++ call in datasetCommon.py:17-67).
  * `grid_subsample_fixed` — static-shape JAX version (sort-by-voxel +
    segment reductions) for fully on-device pipelines; emits `capacity`
    padded rows plus a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def grid_subsampling(
    points: np.ndarray,
    features: np.ndarray | None = None,
    labels: np.ndarray | None = None,
    sampleDl: float = 0.1,
    verbose: int = 0,
):
    """Barycenter grid subsampling (host, numpy).

    Matches the C++ 'barycenters' method: voxel index from the floored
    min-corner-shifted coordinates; per-voxel mean of points and features and
    majority label (reference: grid_subsampling.cpp:57-107).

    Returns points (and features / labels) in first-appearance order of the
    voxels, like the C++ unordered_map insertion order is stable per run —
    order differs from the reference but downstream consumers never rely on
    voxel order (kNN graphs are rebuilt per level).
    """
    del verbose
    points = np.ascontiguousarray(points, dtype=np.float32)
    origin = np.floor(points.min(axis=0) / sampleDl) * sampleDl
    cell = np.floor((points - origin) / sampleDl).astype(np.int64)
    dims = cell.max(axis=0) + 1
    key = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]

    uniq, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    n_vox = uniq.shape[0]

    sub_points = np.zeros((n_vox, points.shape[1]), dtype=np.float64)
    np.add.at(sub_points, inv, points.astype(np.float64))
    sub_points = (sub_points / counts[:, None]).astype(np.float32)

    out = [sub_points]
    if features is not None:
        feats = np.ascontiguousarray(features, dtype=np.float64)
        sub_feats = np.zeros((n_vox, feats.shape[1]), dtype=np.float64)
        np.add.at(sub_feats, inv, feats)
        out.append((sub_feats / counts[:, None]).astype(np.float32))
    if labels is not None:
        lab = np.asarray(labels).reshape(-1).astype(np.int64)
        # Majority vote per voxel over the label histogram.
        lab_shift = lab - lab.min()
        n_lab = int(lab_shift.max()) + 1
        hist = np.zeros((n_vox, n_lab), dtype=np.int64)
        np.add.at(hist, (inv, lab_shift), 1)
        out.append((hist.argmax(axis=1) + lab.min()).astype(np.int32))

    if len(out) == 1:
        return out[0]
    return tuple(out)


def grid_subsample_fixed(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    sample_dl: float,
    capacity: int,
    features: jnp.ndarray | None = None,
):
    """Static-shape on-device grid subsampling.

    Sorts points by voxel key, reduces per segment, and scatters the per-voxel
    barycenters into a `capacity`-row output. Voxels beyond `capacity` are
    dropped (callers size capacity generously; voxel counts shrink ~8x per
    level). Padded rows get mask=False and coordinates far outside the scene
    so downstream kNN never selects them even unmasked.

    Returns (sub_points [capacity,3], sub_feats or None, sub_mask [capacity]).
    """
    pts = points.astype(jnp.float32)
    big = jnp.float32(1e6)
    safe = jnp.where(mask[:, None], pts, big)
    origin = jnp.floor(jnp.min(safe, axis=0) / sample_dl) * sample_dl
    # int32 ravel key: per-scene extents (indoor scenes / voxel size) keep
    # dims[0]*dims[1]*dims[2] far below 2^31.
    cell = jnp.floor((pts - origin) / sample_dl).astype(jnp.int32)
    dims = jnp.max(jnp.where(mask[:, None], cell, 0), axis=0) + 1
    key = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    key = jnp.where(mask, key, jnp.iinfo(jnp.int32).max)  # padding sorts last

    order = jnp.argsort(key)
    key_s = key[order]
    pts_s = pts[order]
    mask_s = mask[order]

    is_head = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]]) & mask_s
    seg_id = jnp.cumsum(is_head.astype(jnp.int32)) - 1  # [-1 or seg index]
    seg_id = jnp.where(mask_s, seg_id, capacity)  # padding -> overflow row

    def seg_mean(vals):
        acc = jnp.zeros((capacity + 1, vals.shape[1]), vals.dtype).at[seg_id].add(vals)
        cnt = jnp.zeros((capacity + 1,), jnp.float32).at[seg_id].add(mask_s.astype(jnp.float32))
        return (acc / jnp.maximum(cnt[:, None], 1.0))[:capacity], cnt[:capacity]

    sub_points, cnt = seg_mean(pts_s)
    sub_mask = cnt > 0
    sub_points = jnp.where(sub_mask[:, None], sub_points, big)

    sub_feats = None
    if features is not None:
        feats_s = features.astype(jnp.float32)[order]
        sub_feats, _ = seg_mean(feats_s)
    return sub_points, sub_feats, sub_mask
