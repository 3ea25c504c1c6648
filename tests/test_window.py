"""Windowed dedup gather (pcf_tpu/ops/window.py): exactness vs the plain
gather, gradients, window construction, Morton ordering, and the full-model
equivalence windowed-vs-plain (the production-criticality test: windows are
a pure execution-strategy change and must be bit-compatible in f32)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pcf_tpu.core.batching import pack_scenes
from pcf_tpu.ops.gather import index_points, index_points_multi
from pcf_tpu.ops.window import (
    WindowedEdges,
    build_windows,
    morton_argsort,
    morton_codes,
    plain_edges,
    windowed_take,
)


def _local_edges(N, K, spread, seed=0):
    rng = np.random.default_rng(seed)
    base = np.arange(N)[:, None]
    return np.clip(base + rng.integers(-spread, spread, (N, K)), 0, N - 1).astype(np.int32)


def test_windowed_take_exact():
    N, K = 1024, 16
    nei = _local_edges(N, K, 120)
    we = build_windows(nei, tile=128, window=512)
    rng = np.random.default_rng(1)
    for dt in (jnp.float32, jnp.bfloat16):
        tab = jnp.asarray(rng.normal(size=(N, 24)), dt)
        out = jax.jit(lambda t: windowed_take(t, we))(tab)
        assert np.array_equal(np.asarray(out), np.asarray(tab)[nei]), dt


def test_windowed_take_grad_matches_plain():
    N, K = 512, 16
    nei = _local_edges(N, K, 100, seed=2)
    we = build_windows(nei, tile=128, window=512)
    tab = jnp.asarray(np.random.default_rng(3).normal(size=(N, 8)), jnp.float32)
    jnei = jnp.asarray(nei)

    def loss_w(t):
        return (windowed_take(t, we) ** 2).sum()

    def loss_p(t):
        return (jnp.take(t, jnei, axis=0, mode="clip") ** 2).sum()

    gw = jax.jit(jax.grad(loss_w))(tab)
    gp = jax.jit(jax.grad(loss_p))(tab)
    # different (but fixed) accumulation order than the plain scatter-add
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gp), rtol=3e-5)


def test_windowed_take_c_split_exact(monkeypatch):
    """Regression for the 2cm/PCF_Large scoped-vmem OOM: when one tile at
    full C exceeds the VMEM budget, _plan_grid splits the feature dim over a
    second grid axis. Force the split with a tiny budget and check both the
    forward and the gradient stay exact. impl="pallas" is pinned explicitly
    (the planner only runs for the Pallas resolve) and trace caches are
    cleared first: a cached trace from an earlier test at the same shapes
    would skip the Python retrace and the spy would record nothing."""
    import pcf_tpu.ops.window as W

    jax.clear_caches()
    N, K, C = 512, 16, 96
    nei = _local_edges(N, K, 100, seed=7)
    we = build_windows(nei, tile=128, window=512)
    tab = jnp.asarray(np.random.default_rng(8).normal(size=(N, C)), jnp.float32)
    jnei = jnp.asarray(nei)

    plans = []
    real_plan = W._plan_grid

    def spy_plan(T, c, est):
        g, cb = real_plan(T, c, est)
        plans.append((g, cb))
        return g, cb

    monkeypatch.setattr(W, "_SCOPED_VMEM_BUDGET", 2 ** 20)
    monkeypatch.setattr(W, "_plan_grid", spy_plan)

    out, vjp = jax.vjp(lambda t: windowed_take(t, we, impl="pallas"), tab)
    (gw,) = vjp(out)
    gp = jax.grad(lambda t: (jnp.take(t, jnei, axis=0, mode="clip") ** 2).sum() / 2)(tab)
    assert any(cb < C for _, cb in plans), plans  # the split actually engaged
    assert np.array_equal(np.asarray(out), np.asarray(tab)[nei])
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gp), rtol=3e-5)


def test_bwd_bf16_cotangent_f32_accumulation():
    """The backward takes bf16 cotangent blocks (halved VMEM) but must
    accumulate in f32: many bf16 additions of same-sign values would lose
    low bits. Equal cotangents scattered onto one row must sum exactly."""
    N, K = 256, 16
    nei = np.zeros((N, K), np.int32)  # every edge hits row 0
    we = build_windows(nei, tile=128, window=128)
    tab = jnp.zeros((N, 4), jnp.bfloat16)

    def loss(t):
        return windowed_take(t, we).astype(jnp.float32).sum()

    g = jax.grad(loss)(tab)  # d/dt row0 = N*K exactly (representable in bf16)
    assert float(np.asarray(g, np.float32)[0, 0]) == N * K


def test_index_points_dispatch():
    N, K = 256, 8
    nei = _local_edges(N, K, 60, seed=4)
    # tile*K must be a multiple of 128: 128*8=1024 ok
    we = build_windows(nei, tile=128, window=256)
    tab = jnp.asarray(np.random.default_rng(5).normal(size=(N, 5)), jnp.float32)
    out = index_points(tab, we)
    assert np.array_equal(np.asarray(out), np.asarray(tab)[nei])
    # multi: two dtypes share the windows, each group exact
    tabs = [tab, jnp.asarray(np.random.default_rng(6).normal(size=(N, 3)), jnp.float32),
            jnp.asarray(np.random.default_rng(7).normal(size=(N, 4)), jnp.bfloat16)]
    outs = index_points_multi(tabs, we)
    for t, o in zip(tabs, outs):
        assert np.array_equal(np.asarray(o), np.asarray(t)[nei])


def test_build_windows_overflow_raises():
    N, K = 512, 16
    nei = np.random.default_rng(8).integers(0, N, (N, K)).astype(np.int32)
    with pytest.raises(ValueError, match="unique neighbor rows exceed"):
        build_windows(nei, tile=128, window=128)
    assert build_windows(nei, tile=128, window=128, strict=False) is None


def test_morton_sort_locality():
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 4, (4096, 3)).astype(np.float32)
    order = morton_argsort(pts)
    codes = morton_codes(pts)[order]
    assert np.all(np.diff(codes.astype(np.int64)) >= 0)
    # consecutive Z-order points are spatially close on average
    sorted_pts = pts[order]
    step = np.linalg.norm(np.diff(sorted_pts, axis=0), axis=1)
    rand_step = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    assert np.median(step) < 0.5 * np.median(rand_step)


def _tiny_batch(window: bool):
    from pcf_tpu.data import synthetic_scene
    from pcf_tpu.data.pyramid import scene_to_item

    grid = [0.2, 0.4, 0.8]
    scenes = []
    for i in range(2):
        coord, norm, feats, labels = synthetic_scene(1500, extent=4.0, seed=i)
        scenes.append(scene_to_item(coord, norm, feats, labels, grid, 16, 16, 16,
                                    rng=np.random.default_rng(i), morton=True))
    return pack_scenes(scenes, bucket_multiple=512,
                       window_tile=128 if window else None)


def test_model_windowed_matches_plain():
    """Full-model equivalence in a SUBPROCESS: XLA:CPU reproducibly
    segfaults compiling this program late in a long suite process (compile,
    serialize, and deserialize all crash after ~100 prior compilations;
    every fresh process passes), so the check gets its own interpreter."""
    import subprocess
    import sys

    res = subprocess.run(
        [sys.executable, "-c",
         "import sys; sys.path.insert(0, 'tests'); "
         "from test_window import model_equivalence_main; "
         "model_equivalence_main()"],
        cwd="/root/repo", capture_output=True, text=True, timeout=900)
    assert res.returncode == 0, f"stdout:{res.stdout}\nstderr:{res.stderr[-3000:]}"


def model_equivalence_main():
    """Same Morton-sorted scenes, windows on vs off: identical f32 logits."""
    from pcf_tpu.config import Config, get_default_configs, get_default_training_cfgs
    from pcf_tpu.models import PointConvFormer_Segmentation

    bw = _tiny_batch(True)
    bp = _tiny_batch(False)
    # windowed packing tile-aligns each scene segment, so row LAYOUTS differ;
    # valid rows (in scene-concatenation order) must still correspond
    mw = np.asarray(bw.masks[0])
    mp = np.asarray(bp.masks[0])
    assert mw.sum() == mp.sum()
    np.testing.assert_allclose(np.asarray(bw.points[0])[mw],
                               np.asarray(bp.points[0])[mp])
    assert isinstance(bw.edges_self[0], WindowedEdges)

    cfg = get_default_training_cfgs(get_default_configs(
        Config(), num_level=3, base_dim=32))
    cfg.update(guided_level=0, num_heads=4, resblocks=[0, 1, 1],
               mid_dim=[4, 4, 4], grid_size=[0.2, 0.4, 0.8], num_classes=5)
    model = PointConvFormer_Segmentation(cfg)

    def fwd(b):
        vs = model.init(jax.random.PRNGKey(0), b.feats, list(b.points),
                        list(b.edges_self), list(b.edges_forward),
                        list(b.edges_propagate), list(b.norms),
                        masks=list(b.masks), train=False)
        return model.apply(vs, b.feats, list(b.points), list(b.edges_self),
                           list(b.edges_forward), list(b.edges_propagate),
                           list(b.norms), masks=list(b.masks), train=False)

    lw = np.asarray(jax.jit(fwd)(bw))[mw]
    lp = np.asarray(jax.jit(fwd)(bp))[mp]
    np.testing.assert_allclose(lw, lp, rtol=1e-5, atol=1e-5)

    # bf16 compute routes feature gathers through the windowed kernels
    # (f32 stays plain — see ops/gather.index_points); the windowed gather
    # is value-exact, so only fusion-order noise may differ.
    cfg.compute_dtype = "bfloat16"
    model_bf = PointConvFormer_Segmentation(cfg)

    def fwd_bf(b):
        vs = model_bf.init(jax.random.PRNGKey(0), b.feats, list(b.points),
                           list(b.edges_self), list(b.edges_forward),
                           list(b.edges_propagate), list(b.norms),
                           masks=list(b.masks), train=False)
        return model_bf.apply(vs, b.feats, list(b.points), list(b.edges_self),
                              list(b.edges_forward), list(b.edges_propagate),
                              list(b.norms), masks=list(b.masks), train=False)

    lwb = np.asarray(jax.jit(fwd_bf)(bw)).astype(np.float32)[mw]
    lpb = np.asarray(jax.jit(fwd_bf)(bp)).astype(np.float32)[mp]
    np.testing.assert_allclose(lwb, lpb, rtol=5e-2, atol=5e-2)


def test_windowed_dp_train_step_matches_plain():
    """Windowed edges stack under stack_batches and run through the
    shard_map DP train step (8 virtual devices); loss matches the plain-edge
    program on the same scenes (windows are an execution strategy only)."""
    from pcf_tpu.config import Config, get_default_configs, get_default_training_cfgs
    from pcf_tpu.data import synthetic_scene
    from pcf_tpu.data.pyramid import scene_to_item
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_mesh, make_train_step, stack_batches
    from pcf_tpu.train.state import create_train_state, make_optimizer

    grid = [0.4, 0.8]
    cfg = get_default_configs(Config(), num_level=2, base_dim=8)
    cfg = get_default_training_cfgs(cfg)
    cfg.update(guided_level=0, num_heads=2, resblocks=[0, 1], mid_dim=[4, 4],
               grid_size=grid, num_classes=4, learning_rate=0.01,
               scheduler="MultiStepWithWarmup", milestones=[1000],
               warmup_epochs=1, use_level_1=False,
               sync_bn=True, bn_axis_name="data")

    def batch(seed, window):
        coord, norm, feats, labels = synthetic_scene(
            150, extent=3.0, num_classes=4, seed=seed)
        item = scene_to_item(coord, norm, feats, labels, grid, 8, 8, 8,
                             rng=np.random.default_rng(seed), morton=True)
        return pack_scenes([item], level_caps=[256, 256],
                           window_tile=128 if window else None)

    model = PointConvFormer_Segmentation(cfg)
    results = {}
    for window in (True, False):
        batches = [batch(i, window) for i in range(8)]
        stacked = stack_batches(batches)
        b0 = batches[0]
        vs = model.init(jax.random.PRNGKey(0), b0.feats, list(b0.points),
                        list(b0.edges_self), list(b0.edges_forward),
                        list(b0.edges_propagate), list(b0.norms),
                        masks=list(b0.masks), train=False)
        tx, _ = make_optimizer(cfg, iter_per_epoch=10)
        state = create_train_state(vs, tx)
        step = make_train_step(model, tx, cfg, mesh=make_mesh(8))
        _, metrics = step(state, stacked, jax.random.PRNGKey(1))
        results[window] = float(metrics["loss"])
        assert np.isfinite(results[window])
    assert abs(results[True] - results[False]) < 1e-4, results


def test_windowed_take_flat_exact():
    """windowed_take_flat: k-major flat layout [M, K*C] with the fold done
    inside the resolve kernel — out[m, k*C+c] == table[nei[m,k], c]. Both
    the in-kernel-fold path (chunk % K == 0) and the 3-D fallback must be
    exact."""
    from pcf_tpu.ops.window import windowed_take_flat

    N, K = 1024, 16
    nei = _local_edges(N, K, 120, seed=4)
    we = build_windows(nei, tile=128, window=512)
    rng = np.random.default_rng(5)
    for C in (3, 6, 24):
        for dt in (jnp.float32, jnp.bfloat16):
            tab = jnp.asarray(rng.normal(size=(N, C)), dt)
            out = jax.jit(lambda t: windowed_take_flat(t, we))(tab)
            assert out.shape == (N, K * C)
            ref = np.asarray(tab)[nei].reshape(N, K * C)
            assert np.array_equal(np.asarray(out), ref), (C, dt)


@pytest.mark.parametrize("impl", ["pallas", "xla"])
@pytest.mark.parametrize("dt", [jnp.bfloat16, jnp.float32])
def test_resolve_impl_exact(impl, dt):
    """The XLA one-hot-einsum resolve (r4 production default: measured
    1.5-3.4x faster than the Pallas kernels on chip) must be EXACT against
    the plain-gather oracle — forward and the d_table cotangent — for both
    bf16 (feature tables) and f32 (geometry tables; HIGHEST-precision
    selection). The Pallas impl is checked for bf16 only: it is gated to
    2-byte tables in production (ops/gather.index_points) and is not exact
    for f32."""
    from pcf_tpu.ops import window as W

    if impl == "pallas" and dt == jnp.float32:
        pytest.skip("pallas resolve is bf16-only in production")
    N, K = 1024, 16
    nei = _local_edges(N, K, 100, seed=11)
    we = build_windows(nei, tile=128, window=512)
    rng = np.random.default_rng(12)
    tab = jnp.asarray(rng.normal(size=(N, 8)), dt)
    prev = W.resolve_impl()
    try:
        W.set_resolve_impl(impl)
        out = jax.jit(lambda t: windowed_take(t, we))(tab)
        oracle = np.asarray(tab)[nei]
        assert np.array_equal(np.asarray(out), oracle), (impl, dt)
        g = jax.jit(jax.grad(
            lambda t: (windowed_take(t, we).astype(jnp.float32) ** 2).sum()
        ))(tab)
        go = np.zeros((N, 8), np.float32)
        np.add.at(go, nei.reshape(-1),
                  2 * np.asarray(tab, np.float32)[nei.reshape(-1)])
        # relative: heavily-referenced rows accumulate hundreds of terms, so
        # f32 reorder noise ~1e-6 rel; bf16 tables round each x^2 product
        rel = 1e-5 if dt == jnp.float32 else 2e-2
        scale = max(1.0, float(np.abs(go).max()))
        err = np.abs(np.asarray(g, np.float32) - go).max()
        assert err < rel * scale, (impl, dt, err, scale)
    finally:
        W.set_resolve_impl(prev)


def test_index_points_f32_windowed_under_xla():
    """Under the xla resolve impl, f32 (geometry) tables ride the windowed
    path and stay bit-exact vs the plain gather (the 4.8x L0 geometry win,
    RESULTS.md r4)."""
    from pcf_tpu.ops import window as W

    N, K = 512, 16
    nei = _local_edges(N, K, 60, seed=13)
    we = build_windows(nei, tile=128, window=512)
    tab = jnp.asarray(np.random.default_rng(14).normal(size=(N, 6)),
                      jnp.float32)
    prev = W.resolve_impl()
    try:
        W.set_resolve_impl("xla")
        out = jax.jit(lambda t: index_points(t, we))(tab)
        assert np.array_equal(np.asarray(out), np.asarray(tab)[nei])
    finally:
        W.set_resolve_impl(prev)
