"""Channel-major geometry chain (r4/r5 eval lever) parity vs the 3-D path.

cfg.cm_geom keeps the per-stage geometry (windowed gather -> localize -> VI)
in channel-major [C, M, K] layout: the windowed resolve emits it directly
(einsum "twc,twe->cte", minor dim M*K — unpadded on TPU, where the row-major
[M, K, c] forms lane-pad c -> 128), and one moveaxis at the stage boundary
restores the layers' [M, K, c] convention. These tests pin the algebra:
windowed_take_cm must be an exact gather, and the cm localize/VI chain must
reproduce VI_coordinate_transform (reference semantics:
/root/reference/layer_utils.py:176-231) to f32 round-off. Model-level: the
cm_geom flag is a pure execution-strategy change — same params, same logits,
same grads.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _local_edges(N, K, spread, seed=0):
    rng = np.random.default_rng(seed)
    base = np.arange(N)[:, None]
    return np.clip(base + rng.integers(-spread, spread, (N, K)),
                   0, N - 1).astype(np.int32)


def test_windowed_take_cm_exact():
    """windowed_take_cm is an exact channel-major gather:
    out[c, m, k] == table[nei[m, k], c] (f32 via HIGHEST selection, bf16)."""
    from pcf_tpu.ops.window import build_windows, windowed_take_cm

    N, K = 1024, 16
    nei = _local_edges(N, K, 120, seed=21)
    we = build_windows(nei, tile=128, window=512)
    rng = np.random.default_rng(22)
    for C in (3, 6):
        for dt in (jnp.float32, jnp.bfloat16):
            tab = jnp.asarray(rng.normal(size=(N, C)), dt)
            out = jax.jit(lambda t: windowed_take_cm(t, we))(tab)
            assert out.shape == (C, N, K)
            ref = np.asarray(tab)[nei]                 # [N, K, C]
            assert np.array_equal(np.asarray(out),
                                  np.moveaxis(ref, -1, 0)), (C, dt)


def test_cm_localize_vi_matches_3d():
    """windowed_take_cm of the [xyz|norm] table + localize_cm + vi_transform_cm
    == the 3-D localize/VI path (moveaxis back for comparison)."""
    from pcf_tpu.ops.vi_transform import (VI_coordinate_transform, localize_cm,
                                          vi_transform_cm)
    from pcf_tpu.ops.window import build_windows, windowed_take_cm

    N, K = 512, 16
    rng = np.random.default_rng(23)
    nei = _local_edges(N, K, 60, seed=24)
    we = build_windows(nei, tile=128, window=256)
    xyz = rng.normal(size=(N, 3)).astype(np.float32)
    norms = rng.normal(size=(N, 3)).astype(np.float32)
    norms /= np.linalg.norm(norms, axis=-1, keepdims=True)

    table = jnp.asarray(np.concatenate([xyz, norms], -1))   # [N, 6]
    g6 = windowed_take_cm(table, we)                        # [6, N, K]
    loc_cm = localize_cm(g6[:3], jnp.asarray(xyz))
    vi_cm = vi_transform_cm(loc_cm, g6[3:], jnp.asarray(norms))
    assert vi_cm.shape == (12, N, K)

    ref_loc = xyz[nei] - xyz[:, None, :]
    np.testing.assert_allclose(np.moveaxis(np.asarray(loc_cm), 0, -1),
                               ref_loc, rtol=1e-6, atol=1e-6)
    vi_3 = VI_coordinate_transform(
        jnp.asarray(ref_loc), jnp.asarray(norms[nei]), jnp.asarray(norms))
    np.testing.assert_allclose(np.moveaxis(np.asarray(vi_cm), 0, -1),
                               np.asarray(vi_3), rtol=1e-4, atol=1e-5)


def test_cm_localize_no_vi():
    """The USE_VI=False branch: a channel-major xyz-only gather + localize."""
    from pcf_tpu.ops.vi_transform import localize_cm
    from pcf_tpu.ops.window import build_windows, windowed_take_cm

    N, K = 256, 16
    rng = np.random.default_rng(25)
    nei = _local_edges(N, K, 40, seed=26)
    we = build_windows(nei, tile=128, window=256)
    xyz = rng.normal(size=(N, 3)).astype(np.float32)
    g3 = windowed_take_cm(jnp.asarray(xyz), we)
    loc = np.moveaxis(np.asarray(localize_cm(g3, jnp.asarray(xyz))), 0, -1)
    np.testing.assert_allclose(loc, xyz[nei] - xyz[:, None, :],
                               rtol=1e-6, atol=1e-6)


def test_model_cm_geom_matches_3d():
    """Full model, windowed batch: cfg.cm_geom on vs off with the SAME
    variables -> same f32 logits, and a train-mode apply -> same batch_stats
    updates and param grads. Subprocess for the same XLA:CPU late-compile
    segfault reason as test_window.test_model_windowed_matches_plain."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, 'tests'); "
         "from test_cmgeom import cm_model_equivalence_main; "
         "cm_model_equivalence_main()"],
        cwd="/root/repo", capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, f"stdout:{res.stdout}\nstderr:{res.stderr[-3000:]}"


def cm_model_equivalence_main():
    import numpy as np
    from test_window import _tiny_batch

    from pcf_tpu.config import (Config, get_default_configs,
                                get_default_training_cfgs)
    from pcf_tpu.models import PointConvFormer_Segmentation

    b = _tiny_batch(True)
    mask = np.asarray(b.masks[0])

    def build(cm):
        cfg = get_default_training_cfgs(get_default_configs(
            Config(), num_level=3, base_dim=32))
        cfg.update(guided_level=0, num_heads=4, resblocks=[0, 1, 1],
                   mid_dim=[4, 4, 4], grid_size=[0.2, 0.4, 0.8],
                   num_classes=5, window_gather=True, cm_geom=cm)
        return PointConvFormer_Segmentation(cfg)

    m3, mc = build(False), build(True)
    vs = m3.init(jax.random.PRNGKey(0), b.feats, list(b.points),
                 list(b.edges_self), list(b.edges_forward),
                 list(b.edges_propagate), list(b.norms),
                 masks=list(b.masks), train=False)
    vsc = mc.init(jax.random.PRNGKey(0), b.feats, list(b.points),
                  list(b.edges_self), list(b.edges_forward),
                  list(b.edges_propagate), list(b.norms),
                  masks=list(b.masks), train=False)
    shapes_equal = jax.tree.map(lambda a, c: a.shape == c.shape, vs, vsc)
    assert all(jax.tree.leaves(shapes_equal)), "param trees differ"

    def fwd(model, v):
        return model.apply(v, b.feats, list(b.points), list(b.edges_self),
                           list(b.edges_forward), list(b.edges_propagate),
                           list(b.norms), masks=list(b.masks), train=False)

    l3 = np.asarray(jax.jit(lambda v: fwd(m3, v))(vs))[mask]
    lc = np.asarray(jax.jit(lambda v: fwd(mc, v))(vs))[mask]
    np.testing.assert_allclose(lc, l3, rtol=2e-4, atol=2e-4)

    # train mode: loss grads + BN stat updates agree through the cm chain
    def loss(model, params, stats):
        out, upd = model.apply(
            {"params": params, "batch_stats": stats},
            b.feats, list(b.points), list(b.edges_self),
            list(b.edges_forward), list(b.edges_propagate), list(b.norms),
            masks=list(b.masks), train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return (out[mask] ** 2).mean(), upd["batch_stats"]

    (l3v, s3), g3 = jax.jit(jax.value_and_grad(
        lambda p: loss(m3, p, vs["batch_stats"]), has_aux=True))(vs["params"])
    (lcv, sc), gc = jax.jit(jax.value_and_grad(
        lambda p: loss(mc, p, vs["batch_stats"]), has_aux=True))(vs["params"])
    np.testing.assert_allclose(float(lcv), float(l3v), rtol=1e-4)
    for a, c in zip(jax.tree.leaves(s3), jax.tree.leaves(sc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=1e-5)
    for a, c in zip(jax.tree.leaves(g3), jax.tree.leaves(gc)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-3, atol=1e-4)
    print("cm-geom model equivalence OK")
