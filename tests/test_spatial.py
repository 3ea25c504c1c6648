"""Spatial (point-dim) sharding: giant-scene eval across the mesh.

A beyond-parity TPU extension (SURVEY.md §5 "long-input handling"): the
sharded forward must produce the same logits as the single-device forward.
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
from pcf_tpu.parallel import make_mesh, spatial_eval_forward

GRID = [0.3, 0.6, 1.2]


def _setup(**overrides):
    cfg = get_default_configs(Config(), num_level=3, base_dim=16)
    cfg = get_default_training_cfgs(cfg)
    cfg.update(guided_level=0, num_heads=4, resblocks=[0, 2, 1],
               mid_dim=[4, 4, 4], grid_size=GRID, num_classes=10,
               resblocks_back=[1, 0, 0], mid_dim_back=4, USE_PE=True)
    cfg.update(overrides)
    coord, norm, feats, labels = synthetic_scene(1200, extent=6.0, seed=4,
                                                 num_classes=10)
    item = scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                         rng=np.random.default_rng(0))
    batch = pack_scenes([item], level_caps=[2048, 1024, 512])
    model = PointConvFormer_Segmentation(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), batch.feats, list(batch.points),
        list(batch.edges_self), list(batch.edges_forward),
        list(batch.edges_propagate), list(batch.norms),
        masks=list(batch.masks), train=False)
    return cfg, model, variables, batch


@pytest.mark.parametrize("overrides", [
    {},                                  # PCF layers + decoder res blocks
    {"guided_level": 99},                # all PointConvStridePE
    {"use_level_1": False},              # selfmlp path
])
def test_spatial_eval_matches_single_device(overrides):
    cfg, model, variables, batch = _setup(**overrides)
    expected = model.apply(
        variables, batch.feats, list(batch.points), list(batch.edges_self),
        list(batch.edges_forward), list(batch.edges_propagate),
        list(batch.norms), masks=list(batch.masks), train=False)

    mesh = make_mesh(4)
    got = spatial_eval_forward(cfg, variables, batch, mesh)
    assert got.shape == expected.shape
    m = np.asarray(batch.masks[0])
    np.testing.assert_allclose(np.asarray(got)[m], np.asarray(expected)[m],
                               atol=2e-5)


def test_spatial_rejects_indivisible_caps():
    cfg, model, variables, batch = _setup()
    mesh = make_mesh(8)  # 1500 % 8 != 0; raises before any compile
    bad = batch.replace(points=(batch.points[0][:1500],) + batch.points[1:])
    with pytest.raises(AssertionError, match="not divisible"):
        spatial_eval_forward(cfg, variables, bad, mesh)


def test_spatial_train_step_matches_single_device():
    """One spatially-sharded train step == the single-device step on the
    same batch (dropout off): same loss, psum'ed IoU histograms, and
    parameters equal up to float reassociation of the psums."""
    from pcf_tpu.parallel import make_spatial_train_step, make_train_step
    from pcf_tpu.train.state import create_train_state, make_optimizer

    cfg, model, variables, batch = _setup(
        dropout_rate=0.0, drop_path_rate=0.0, dropout_fc=0.0,
        learning_rate=0.05, scheduler="MultiStepWithWarmup",
        milestones=[1000], warmup_epochs=1, optimizer="SGD",
        label_smoothing=0.2, BATCH_NORM=True)
    tx, _ = make_optimizer(cfg, iter_per_epoch=10)
    state = create_train_state(variables, tx)
    rng = jax.random.PRNGKey(3)

    single = make_train_step(model, tx, cfg, mesh=None)
    s_ref, m_ref = single(state, batch, rng)

    mesh = make_mesh(4)
    step = make_spatial_train_step(cfg, tx, mesh)
    s_sp, m_sp = step(state, batch, rng)

    assert np.isfinite(float(m_sp["loss"]))
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    for k in ("intersection", "union", "target"):
        np.testing.assert_array_equal(np.asarray(m_sp[k]),
                                      np.asarray(m_ref[k]))
    for a, b in zip(jax.tree_util.tree_leaves(s_sp.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
    # BN running stats psum to the same global batch statistics
    for a, b in zip(jax.tree_util.tree_leaves(s_sp.batch_stats),
                    jax.tree_util.tree_leaves(s_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_dp_x_spatial_2d_mesh_train_step():
    """DP x spatial 2-D mesh (scenes x point-shards) == the plain 2-device
    DP step with SyncBN on the same stacked batch: both pool BN statistics
    globally, pmean the per-scene losses/grads, and psum the IoU
    histograms — the 2-D step just also splits each scene's points."""
    from jax.sharding import Mesh

    from pcf_tpu.parallel import make_spatial_train_step, make_train_step
    from pcf_tpu.parallel.mesh import stack_batches
    from pcf_tpu.train.state import create_train_state, make_optimizer

    over = dict(dropout_rate=0.0, drop_path_rate=0.0, dropout_fc=0.0,
                learning_rate=0.05, scheduler="MultiStepWithWarmup",
                milestones=[1000], warmup_epochs=1, optimizer="SGD",
                label_smoothing=0.2, BATCH_NORM=True, sync_bn=True)
    cfg, model, variables, b0 = _setup(**over)
    # a second scene with the same pinned caps
    coord, norm, feats, labels = synthetic_scene(1100, extent=6.0, seed=7,
                                                 num_classes=10)
    item = scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                         rng=np.random.default_rng(7))
    b1 = pack_scenes([item], level_caps=[2048, 1024, 512])
    stacked = stack_batches([b0, b1])

    tx, _ = make_optimizer(cfg, iter_per_epoch=10)
    state = create_train_state(variables, tx)
    rng = jax.random.PRNGKey(3)

    # reference: plain 2-device DP with SyncBN (model rebuilt with the DP
    # bn axis so batch stats pool over the scenes, like the 2-D step's)
    cfg_dp = cfg.copy()
    cfg_dp.bn_axis_name = "data"
    model_dp = PointConvFormer_Segmentation(cfg_dp)
    dp_mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    dp_step = make_train_step(model_dp, tx, cfg_dp, mesh=dp_mesh)
    s_ref, m_ref = dp_step(state, stacked, rng)

    mesh = Mesh(np.array(jax.devices()[:4]).reshape(2, 2), ("data", "space"))
    step = make_spatial_train_step(cfg, tx, mesh)
    s2, m2 = step(state, stacked, rng)

    np.testing.assert_allclose(float(m2["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    for k in ("intersection", "union", "target"):
        np.testing.assert_array_equal(np.asarray(m2[k]),
                                      np.asarray(m_ref[k]))
    for a, b in zip(jax.tree_util.tree_leaves(s2.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s2.batch_stats),
                    jax.tree_util.tree_leaves(s_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-5)
