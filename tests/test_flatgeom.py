"""Flat-lane geometry chain (r4 eval lever) parity vs the 3-D path.

The flat path keeps the per-edge geometry chain (localize -> VI ->
WeightNet / pe_convs) in k-major [M, K*c] lane layout — unpadded on TPU —
with the SAME parameter tree as the 3-D modules (checkpoints interchange).
These tests pin the algebra: every flat module/computation must reproduce
the 3-D result to f32/bf16 round-off with shared variables.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_weightnet_flat_matches_3d(rng):
    from pcf_tpu.nn.weightnet import WeightNet

    M, K, CIN, W = 96, 16, 12, 16
    x3 = jnp.asarray(rng.normal(size=(M, K, CIN)), jnp.float32)
    mask = jnp.asarray(rng.random(M) < 0.8)

    wn3 = WeightNet(W, hidden_unit=(16,), efficient=False)
    wnf = WeightNet(W, hidden_unit=(16,), efficient=False, flat_k=K)
    v = wn3.init(jax.random.PRNGKey(0), x3, mask=mask, train=False)
    xf = x3.reshape(M, K * CIN)

    # flat init builds the identical param tree (kernels [cin, d])
    vf = wnf.init(jax.random.PRNGKey(0), xf, mask=mask, train=False)
    chex_tree = jax.tree.map(lambda a, b: a.shape == b.shape, v, vf)
    assert all(jax.tree.leaves(chex_tree))

    # train mode: outputs AND updated batch stats agree
    y3, upd3 = wn3.apply(v, x3, mask=mask, train=True,
                         mutable=["batch_stats"])
    yf, updf = wnf.apply(v, xf, mask=mask, train=True,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yf).reshape(M, K, W),
                               np.asarray(y3), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(upd3), jax.tree.leaves(updf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)

    # eval mode on the calibrated stats
    v2 = {"params": v["params"], "batch_stats": upd3["batch_stats"]}
    e3 = wn3.apply(v2, x3, mask=mask, train=False)
    ef = wnf.apply(v2, xf, mask=mask, train=False)
    np.testing.assert_allclose(np.asarray(ef).reshape(M, K, W),
                               np.asarray(e3), rtol=1e-4, atol=1e-5)


def test_weightnet_flat_bf16(rng):
    """bf16 compute dtype: flat kron matmul vs 3-D Dense, same params."""
    from pcf_tpu.nn.weightnet import WeightNet

    M, K, CIN, W = 64, 16, 3, 16
    x3 = jnp.asarray(rng.normal(size=(M, K, CIN)), jnp.float32)
    wn3 = WeightNet(W, hidden_unit=(32,), dtype=jnp.bfloat16)
    wnf = WeightNet(W, hidden_unit=(32,), dtype=jnp.bfloat16, flat_k=K)
    v = wn3.init(jax.random.PRNGKey(1), x3, train=False)
    y3 = wn3.apply(v, x3, train=False)
    yf = wnf.apply(v, x3.reshape(M, K * CIN), train=False)
    np.testing.assert_allclose(
        np.asarray(yf, np.float32).reshape(M, K, W),
        np.asarray(y3, np.float32), rtol=0.05, atol=0.05)


def test_flat_localize_matches_3d(rng):
    """windowed_take_flat of the [xyz|norm] table + lane-select + center
    tile == the 3-D localize path."""
    from pcf_tpu.ops.vi_transform import vi_transform_flat, VI_coordinate_transform
    from pcf_tpu.ops.window import build_windows, windowed_take_flat

    N, K = 512, 16
    base = np.arange(N)[:, None]
    nei = np.clip(base + rng.integers(-60, 60, (N, K)), 0, N - 1).astype(np.int32)
    we = build_windows(nei, tile=128, window=256)
    xyz = rng.normal(size=(N, 3)).astype(np.float32)
    norms = rng.normal(size=(N, 3)).astype(np.float32)
    norms /= np.linalg.norm(norms, axis=-1, keepdims=True)

    table = jnp.asarray(np.concatenate([xyz, norms], -1))  # [N, 6]
    flat6 = windowed_take_flat(table, we)                  # [N, K*6]
    # lane-select xyz / norms out of the k-major 6-blocks
    sel_x = np.zeros((6 * K, 3 * K), np.float32)
    sel_n = np.zeros((6 * K, 3 * K), np.float32)
    for k in range(K):
        for c in range(3):
            sel_x[6 * k + c, 3 * k + c] = 1.0
            sel_n[6 * k + 3 + c, 3 * k + c] = 1.0
    gx = jnp.dot(flat6, jnp.asarray(sel_x),
                 precision=jax.lax.Precision.HIGHEST)
    gn = jnp.dot(flat6, jnp.asarray(sel_n),
                 precision=jax.lax.Precision.HIGHEST)
    tile3 = np.zeros((3, 3 * K), np.float32)
    for k in range(K):
        for c in range(3):
            tile3[c, 3 * k + c] = 1.0
    loc = gx - jnp.dot(jnp.asarray(xyz), jnp.asarray(tile3),
                       precision=jax.lax.Precision.HIGHEST)

    ref_loc = xyz[nei] - xyz[:, None, :]
    np.testing.assert_allclose(np.asarray(loc).reshape(N, K, 3), ref_loc,
                               rtol=1e-6, atol=1e-6)

    vi_f = vi_transform_flat(loc, gn, jnp.asarray(norms))
    vi_3 = VI_coordinate_transform(
        jnp.asarray(ref_loc), jnp.asarray(norms[nei]), jnp.asarray(norms))
    np.testing.assert_allclose(np.asarray(vi_f).reshape(N, K, 12),
                               np.asarray(vi_3), rtol=1e-4, atol=1e-5)


def test_model_flat_geom_matches_3d():
    """Full model, windowed batch: cfg.flat_geom on vs off with the SAME
    variables (the param tree is identical) -> same f32 logits, and a
    train-mode apply -> same batch_stats updates and param grads.
    Subprocess for the same XLA:CPU late-compile segfault reason as
    test_window.test_model_windowed_matches_plain."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, 'tests'); "
         "from test_flatgeom import flat_model_equivalence_main; "
         "flat_model_equivalence_main()"],
        cwd="/root/repo", capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, f"stdout:{res.stdout}\nstderr:{res.stderr[-3000:]}"


def flat_model_equivalence_main():
    import numpy as np
    from test_window import _tiny_batch

    from pcf_tpu.config import Config, get_default_configs, get_default_training_cfgs
    from pcf_tpu.models import PointConvFormer_Segmentation

    b = _tiny_batch(True)
    mask = np.asarray(b.masks[0])

    def build(flat):
        cfg = get_default_training_cfgs(get_default_configs(
            Config(), num_level=3, base_dim=32))
        cfg.update(guided_level=0, num_heads=4, resblocks=[0, 1, 1],
                   mid_dim=[4, 4, 4], grid_size=[0.2, 0.4, 0.8],
                   num_classes=5, window_gather=True, flat_geom=flat)
        return PointConvFormer_Segmentation(cfg)

    m3, mf = build(False), build(True)
    vs = m3.init(jax.random.PRNGKey(0), b.feats, list(b.points),
                 list(b.edges_self), list(b.edges_forward),
                 list(b.edges_propagate), list(b.norms),
                 masks=list(b.masks), train=False)
    vsf = mf.init(jax.random.PRNGKey(0), b.feats, list(b.points),
                  list(b.edges_self), list(b.edges_forward),
                  list(b.edges_propagate), list(b.norms),
                  masks=list(b.masks), train=False)
    shapes_equal = jax.tree.map(lambda a, c: a.shape == c.shape, vs, vsf)
    assert all(jax.tree.leaves(shapes_equal)), "param trees differ"

    def fwd(model, v):
        return model.apply(v, b.feats, list(b.points), list(b.edges_self),
                           list(b.edges_forward), list(b.edges_propagate),
                           list(b.norms), masks=list(b.masks), train=False)

    l3 = np.asarray(jax.jit(lambda v: fwd(m3, v))(vs))[mask]
    lf = np.asarray(jax.jit(lambda v: fwd(mf, v))(vs))[mask]
    np.testing.assert_allclose(lf, l3, rtol=2e-4, atol=2e-4)

    # train mode: loss grads + BN stat updates agree through the flat chain
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
    (lfv, sf), gf = jax.jit(jax.value_and_grad(
        lambda p: loss(mf, p, vs["batch_stats"]), has_aux=True))(vs["params"])
    np.testing.assert_allclose(float(lfv), float(l3v), rtol=1e-4)
    for a, c in zip(jax.tree.leaves(s3), jax.tree.leaves(sf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=1e-3, atol=1e-5)
    for a, c in zip(jax.tree.leaves(g3), jax.tree.leaves(gf)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                   rtol=5e-3, atol=1e-4)
    print("flat-geom model equivalence OK")
