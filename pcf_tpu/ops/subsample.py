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
    labels: jnp.ndarray | None = None,
    num_classes: int | None = None,
    bid: jnp.ndarray | None = None,
    n_scenes: int = 1,
):
    """Static-shape on-device grid subsampling (one jit program).

    Sorts points by voxel key, reduces per segment, and scatters the
    per-voxel barycenters / feature means / majority-vote labels into a
    `capacity`-row output. With `bid` (per-point scene id of a packed batch,
    -1 on padding) the key separates scenes so one call subsamples a whole
    packed batch. Padded rows get mask=False and coordinates far outside the
    scene so downstream kNN never selects them even unmasked.

    Returns a dict: points [capacity,3], feats (or None), labels (or None,
    int32 majority per voxel), bid [capacity] int32 (or None), mask
    [capacity] bool, overflow () bool — True when the input had more voxels
    than `capacity` (excess voxels were dropped) or when the bid-composed
    key could overflow int32; callers must treat overflow=True as a
    mis-sized capacity, not a valid result.
    """
    pts = points.astype(jnp.float32)
    big = jnp.float32(1e6)
    safe = jnp.where(mask[:, None], pts, big)
    origin = jnp.floor(jnp.min(safe, axis=0) / sample_dl) * sample_dl
    cell = jnp.floor((pts - origin) / sample_dl).astype(jnp.int32)
    dims = jnp.max(jnp.where(mask[:, None], cell, 0), axis=0) + 1
    key = (cell[:, 0] * dims[1] + cell[:, 1]) * dims[2] + cell[:, 2]
    # int32 key-range guard (detectable on device, checked via float math)
    total_cells = jnp.prod(dims.astype(jnp.float32))
    key_overflow = total_cells * n_scenes > jnp.float32(2 ** 31 - 1)
    if bid is not None:
        key = key * n_scenes + jnp.clip(bid, 0, n_scenes - 1)
    key = jnp.where(mask, key, jnp.iinfo(jnp.int32).max)  # padding sorts last

    order = jnp.argsort(key)
    key_s = key[order]
    mask_s = mask[order]

    is_head = jnp.concatenate([jnp.array([True]), key_s[1:] != key_s[:-1]]) & mask_s
    n_voxels = jnp.sum(is_head.astype(jnp.int32))
    seg_id = jnp.cumsum(is_head.astype(jnp.int32)) - 1  # [-1 or seg index]
    seg_id = jnp.where(mask_s & (seg_id < capacity), seg_id, capacity)

    def seg_mean(vals):
        acc = jnp.zeros((capacity + 1, vals.shape[1]), vals.dtype).at[seg_id].add(vals)
        cnt = jnp.zeros((capacity + 1,), jnp.float32).at[seg_id].add(mask_s.astype(jnp.float32))
        return (acc / jnp.maximum(cnt[:, None], 1.0))[:capacity], cnt[:capacity]

    sub_points, cnt = seg_mean(pts[order])
    sub_mask = cnt > 0
    sub_points = jnp.where(sub_mask[:, None], sub_points, big)

    out = {"points": sub_points, "feats": None, "labels": None, "bid": None,
           "mask": sub_mask,
           "overflow": (n_voxels > capacity) | key_overflow}
    if features is not None:
        out["feats"], _ = seg_mean(features.astype(jnp.float32)[order])
    if labels is not None:
        assert num_classes is not None, "labels need num_classes for the vote"
        lab_s = labels[order].astype(jnp.int32)
        valid = mask_s & (lab_s >= 0) & (lab_s < num_classes)
        onehot = jnp.where(
            valid[:, None],
            jax.nn.one_hot(jnp.clip(lab_s, 0, num_classes - 1), num_classes,
                           dtype=jnp.int32),
            0)
        hist = jnp.zeros((capacity + 1, num_classes), jnp.int32).at[seg_id].add(onehot)
        voted = jnp.argmax(hist[:capacity], axis=1).astype(jnp.int32)
        any_vote = jnp.sum(hist[:capacity], axis=1) > 0
        out["labels"] = jnp.where(sub_mask & any_vote, voted, -100)
    if bid is not None:
        bid_s = jnp.where(mask_s, bid[order].astype(jnp.int32), 0)
        sub_bid = jnp.zeros((capacity + 1,), jnp.int32).at[seg_id].max(bid_s)[:capacity]
        out["bid"] = jnp.where(sub_mask, sub_bid, -1)
    return out
