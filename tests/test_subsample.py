"""Grid subsampling + voxelize tests vs slow python oracles."""

import jax.numpy as jnp
import numpy as np

from pcf_tpu.ops import grid_subsampling, voxelize
from pcf_tpu.ops.subsample import grid_subsample_fixed


def _oracle_subsample(points, features, labels, dl):
    """Slow per-voxel dict oracle mirroring grid_subsampling.cpp:57-107."""
    origin = np.floor(points.min(0) / dl) * dl
    cells = np.floor((points - origin) / dl).astype(np.int64)
    vox = {}
    for i, c in enumerate(map(tuple, cells)):
        vox.setdefault(c, []).append(i)
    pts, fts, labs = [], [], []
    for ids in vox.values():
        pts.append(points[ids].mean(0))
        if features is not None:
            fts.append(features[ids].mean(0))
        if labels is not None:
            vals, counts = np.unique(labels[ids], return_counts=True)
            labs.append(vals[counts.argmax()])
    return np.array(pts), (np.array(fts) if features is not None else None), (
        np.array(labs) if labels is not None else None)


def _match_rows(a, b):
    """Order-independent row matching via lexsort."""
    def key(x):
        return np.lexsort(np.round(x, 5).T[::-1])
    return a[key(a)], b[key(b)]


def test_grid_subsampling_barycenters(rng):
    pts = rng.uniform(0, 2, size=(500, 3)).astype(np.float32)
    feats = rng.normal(size=(500, 4)).astype(np.float32)
    labels = rng.integers(0, 5, size=(500,)).astype(np.int32)

    sp, sf, sl = grid_subsampling(pts, feats, labels, sampleDl=0.3)
    op, of, ol = _oracle_subsample(pts, feats, labels, 0.3)
    assert sp.shape == op.shape
    a, b = _match_rows(sp, op)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_grid_subsampling_points_only(rng):
    pts = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
    sp = grid_subsampling(pts, sampleDl=0.25)
    op, _, _ = _oracle_subsample(pts, None, None, 0.25)
    a, b = _match_rows(sp, op)
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_grid_subsample_fixed_matches_host(rng):
    """Device (JAX) grid subsample vs host numpy version, padded + masked."""
    pts = rng.uniform(0, 2, size=(300, 3)).astype(np.float32)
    feats = rng.normal(size=(300, 3)).astype(np.float32)
    host_p, host_f = grid_subsampling(pts, feats, sampleDl=0.4)

    n_pad = 350
    pad_pts = np.zeros((n_pad, 3), np.float32)
    pad_pts[:300] = pts
    pad_f = np.zeros((n_pad, 3), np.float32)
    pad_f[:300] = feats
    mask = np.arange(n_pad) < 300

    out = grid_subsample_fixed(
        jnp.asarray(pad_pts), jnp.asarray(mask), 0.4, capacity=256,
        features=jnp.asarray(pad_f))
    dp, df, dm = out["points"], out["feats"], out["mask"]
    assert not bool(out["overflow"])
    dm = np.asarray(dm)
    assert dm.sum() == host_p.shape[0]
    a, b = _match_rows(np.asarray(dp)[dm], host_p)
    np.testing.assert_allclose(a, b, atol=1e-4)
    fa, fb = _match_rows(np.asarray(df)[dm], host_f)
    # rows sort by points, so features need the same permutation; just compare sums
    np.testing.assert_allclose(np.asarray(df)[dm].sum(0), host_f.sum(0), atol=1e-3)


def test_voxelize_modes(rng):
    pts = rng.uniform(0, 1, size=(400, 3)).astype(np.float32)
    idx_r = voxelize(pts, 0.2, mode="random", rng=rng)
    idx_d = voxelize(pts, 0.2, mode="deterministic")
    assert len(idx_r) == len(idx_d)
    # deterministic is reproducible
    np.testing.assert_array_equal(idx_d, voxelize(pts, 0.2, mode="deterministic"))
    # each voxel contributes exactly one point: floored cells are unique
    cells = np.floor(pts[idx_d] / 0.2)
    assert len(np.unique(cells, axis=0)) == len(idx_d)


def test_voxelize_multiple_covers_everything(rng):
    pts = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
    idx_sets = voxelize(pts, 0.3, mode="multiple")
    covered = np.unique(np.concatenate(idx_sets))
    assert covered.size == 300, "'multiple' mode must cover every point (voxelize.py:71-77)"
