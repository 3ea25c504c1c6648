"""Synthetic scene generator for tests and benchmarks.

Produces surface-like clouds (points on randomly oriented planar patches with
noise) so voxel occupancy and kNN statistics resemble indoor scans rather
than uniform noise. The reference's equivalent is the random-cloud plumbing
in tests_pointconv/encoder.py:88-123.
"""

from __future__ import annotations

import numpy as np


def synthetic_scene(
    n_points: int,
    extent: float = 8.0,
    n_patches: int = 24,
    num_classes: int = 20,
    feat_dim: int = 3,
    seed: int = 0,
):
    """Returns (coord [N,3], norm [N,3], feats [N,feat_dim], labels [N])."""
    rng = np.random.default_rng(seed)
    per = -(-n_points // n_patches)
    coords, norms, labels = [], [], []
    for p in range(n_patches):
        center = rng.uniform(0, extent, 3)
        # random orthonormal frame
        q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
        u, v, n = q[:, 0], q[:, 1], q[:, 2]
        size = rng.uniform(0.5, extent / 2)
        a = rng.uniform(-size, size, (per, 1))
        b = rng.uniform(-size, size, (per, 1))
        pts = center + a * u + b * v + rng.normal(0, 0.01, (per, 3))
        coords.append(pts)
        norms.append(np.tile(n, (per, 1)))
        labels.append(np.full(per, p % num_classes))
    coord = np.concatenate(coords)[:n_points].astype(np.float32)
    norm = np.concatenate(norms)[:n_points].astype(np.float32)
    labels = np.concatenate(labels)[:n_points].astype(np.int32)
    feats = rng.uniform(-1, 1, (n_points, feat_dim)).astype(np.float32)
    return coord, norm, feats, labels
