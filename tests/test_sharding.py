"""Data-parallel (shard_map) tests on the virtual 8-device CPU mesh.

The reference has NO distributed tests (SURVEY.md §4); this suite validates
the DDP-replacement path end-to-end: sharded train step, psum'ed gradients
and metrics, psum-SyncBN, and replicated parameter updates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcf_tpu.config import Config, get_default_configs, get_default_training_cfgs
from pcf_tpu.core import pack_scenes
from pcf_tpu.data import synthetic_scene
from pcf_tpu.data.pyramid import scene_to_item
from pcf_tpu.models import PointConvFormer_Segmentation
from pcf_tpu.parallel import make_mesh, make_train_step, make_eval_step, stack_batches
from pcf_tpu.train.state import create_train_state, make_optimizer

GRID = [0.4, 0.8]


@pytest.fixture(scope="module", autouse=True)
def _fresh_compile_state():
    """Drop every live jitted executable before compiling the 8-device SPMD
    step: with the full suite's ~100 compiled programs still referenced, the
    XLA:CPU compile of this module's shard_map program segfaults
    deterministically (reproduced 4x; both half-suites and isolated runs
    pass, fresh persistent cache doesn't help — it's in-process compiler
    state, not disk). Clearing jax's caches sidesteps it and costs only a
    recompile of fixtures shared with earlier modules."""
    jax.clear_caches()


def _tiny_cfg():
    cfg = get_default_configs(Config(), num_level=2, base_dim=8)
    cfg = get_default_training_cfgs(cfg)
    cfg.update(guided_level=0, num_heads=2, resblocks=[0, 1], mid_dim=[4, 4],
               grid_size=GRID, num_classes=4, learning_rate=0.01,
               scheduler="MultiStepWithWarmup", milestones=[1000],
               warmup_epochs=1, use_level_1=False,
               sync_bn=True, bn_axis_name="data")
    return cfg


def _one_batch(seed, caps):
    coord, norm, feats, labels = synthetic_scene(150, extent=3.0, num_classes=4,
                                                 seed=seed)
    item = scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                         rng=np.random.default_rng(seed))
    return pack_scenes([item], level_caps=caps)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    cfg = _tiny_cfg()
    caps = [256, 256]
    model = PointConvFormer_Segmentation(cfg)
    batches = [_one_batch(i, caps) for i in range(8)]
    stacked = stack_batches(batches)
    b0 = batches[0]
    args = (b0.feats, list(b0.points), list(b0.edges_self), list(b0.edges_forward),
            list(b0.edges_propagate), list(b0.norms))
    vs = model.init(jax.random.PRNGKey(0), *args, masks=list(b0.masks), train=False)
    tx, _ = make_optimizer(cfg, iter_per_epoch=10)
    state = create_train_state(vs, tx)
    return cfg, model, tx, state, stacked, batches


def test_sharded_train_step_runs(setup):
    cfg, model, tx, state, stacked, batches = setup
    mesh = make_mesh(8)
    step = make_train_step(model, tx, cfg, mesh=mesh)
    new_state, metrics = step(state, stacked, jax.random.PRNGKey(7))
    assert bool(jnp.isfinite(metrics["loss"]))
    assert metrics["intersection"].shape == (cfg.num_classes,)
    leaves = jax.tree_util.tree_leaves(new_state.params)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # a second step composes
    new_state2, _ = step(new_state, stacked, jax.random.PRNGKey(8))
    assert int(new_state2.step) == 2


def test_sharded_metrics_sum_devices(setup):
    """psum'ed IoU histograms == sum of per-device histograms
    (replaces dist.all_reduce of IoU tensors, train_ScanNet_DDP_WarmUP.py:441-444)."""
    cfg, model, tx, state, stacked, batches = setup
    mesh = make_mesh(8)
    step = make_train_step(model, tx, cfg, mesh=mesh)
    _, metrics = step(state, stacked, jax.random.PRNGKey(7))

    # single-device reference: same model minus the sync-BN axis binding
    cfg_local = cfg.copy()
    cfg_local.pop("bn_axis_name")
    model_local = PointConvFormer_Segmentation(cfg_local)
    total = np.zeros(cfg.num_classes)
    single = make_train_step(model_local, tx, cfg_local, mesh=None)
    for b in batches:
        _, m = single(state, b, jax.random.PRNGKey(7))
        total += np.asarray(m["target"])
    np.testing.assert_allclose(np.asarray(metrics["target"]), total, rtol=1e-6)


def test_sharded_eval_step(setup):
    cfg, model, tx, state, stacked, batches = setup
    mesh = make_mesh(8)
    ev = make_eval_step(model, cfg, mesh=mesh)
    logits = ev(state, stacked)
    assert logits.shape[0] == 8
    assert bool(jnp.isfinite(logits).all())


def test_sync_bn_stats_match_global(setup):
    """With bn_axis_name, per-device BN stats equal the all-data stats
    (the SyncBatchNorm contract, train_ScanNet_DDP_WarmUP.py:192-193)."""
    from pcf_tpu.nn.norm import MaskedBatchNorm
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(8)
    rngnp = np.random.default_rng(0)
    x = rngnp.normal(size=(8, 16, 4)).astype(np.float32)
    mask = rngnp.uniform(size=(8, 16)) < 0.8

    bn = MaskedBatchNorm(4, axis_name="data")
    vs = bn.init(jax.random.PRNGKey(0), jnp.asarray(x[0]), jnp.asarray(mask[0]),
                 use_running_average=True)

    def device_fn(xs, ms):
        y, nv = bn.apply(vs, xs[0], ms[0], mutable=["batch_stats"])
        return nv["batch_stats"]["mean"]

    f = jax.jit(jax.shard_map(device_fn, mesh=mesh, in_specs=(P("data"), P("data")),
                              out_specs=P(), check_vma=False))
    got = np.asarray(f(jnp.asarray(x), jnp.asarray(mask)))
    want = 0.1 * x[mask].mean(axis=0)  # torch momentum update from zeros
    np.testing.assert_allclose(got, want, atol=1e-5)
