"""End-to-end model tests on synthetic scenes (the minimum end-to-end slice:
random clouds -> voxelize/subsample -> kNN -> model -> loss -> grads,
mirroring the reference's tests_pointconv/encoder.py strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcf_tpu.config import Config, get_default_configs
from pcf_tpu.core import pack_scenes
from pcf_tpu.data import synthetic_scene
from pcf_tpu.data.pyramid import scene_to_item
from pcf_tpu.models import PCF_Backbone, PointConvFormer_Segmentation
from pcf_tpu.models.zoo import PCF_Large, PCF_Normal, PCF_Small, PCF_Tiny
from pcf_tpu.train.loss import cross_entropy_loss

GRID = [0.3, 0.6, 1.2]


def tiny_cfg(**kw):
    cfg = get_default_configs(Config(), num_level=3, base_dim=8)
    cfg.guided_level = 0
    cfg.num_heads = 2
    cfg.resblocks = [0, 1, 1]
    cfg.mid_dim = [4, 4, 4]
    cfg.grid_size = GRID
    cfg.num_classes = 5
    cfg.update(kw)
    return cfg


@pytest.fixture(scope="module")
def packed_batch():
    scenes = []
    for i, n in enumerate((300, 200)):
        coord, norm, feats, labels = synthetic_scene(n, extent=4.0, num_classes=5, seed=i)
        scenes.append(scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                                    rng=np.random.default_rng(i)))
    return pack_scenes(scenes, bucket_multiple=256)


def test_pack_scenes_shapes(packed_batch):
    b = packed_batch
    assert b.num_levels == 3
    assert b.feats.shape[0] == b.points[0].shape[0] == b.labels.shape[0]
    assert int(b.masks[0].sum()) == 500
    # all edges in range and, for valid rows, pointing at valid points
    for lvl in range(3):
        es = np.asarray(b.edges_self[lvl])
        m = np.asarray(b.masks[lvl])
        assert es.max() < b.points[lvl].shape[0]
        ref_mask = np.asarray(b.masks[lvl])
        assert ref_mask[es[m]].all(), f"self edges at level {lvl} point into padding"
    for lvl in range(2):
        ef = np.asarray(b.edges_forward[lvl])
        m_next = np.asarray(b.masks[lvl + 1])
        assert np.asarray(b.masks[lvl])[ef[m_next]].all()
        ep = np.asarray(b.edges_propagate[lvl])
        m_cur = np.asarray(b.masks[lvl])
        assert m_next[ep[m_cur]].all()


def test_backbone_forward(packed_batch):
    b = packed_batch
    cfg = tiny_cfg()
    model = PCF_Backbone(cfg)
    vs = model.init(jax.random.PRNGKey(0), b.feats, list(b.points),
                    list(b.edges_self), list(b.edges_forward), list(b.norms),
                    masks=list(b.masks), train=False)
    feat_list = model.apply(vs, b.feats, list(b.points), list(b.edges_self),
                            list(b.edges_forward), list(b.norms),
                            masks=list(b.masks), train=False)
    assert len(feat_list) == 3
    for lvl, f in enumerate(feat_list):
        assert f.shape == (b.points[lvl].shape[0], cfg.feat_dim[lvl])
        assert bool(jnp.isfinite(f[b.masks[lvl]]).all())


def test_segmentation_forward_and_grads(packed_batch):
    b = packed_batch
    cfg = tiny_cfg()
    model = PointConvFormer_Segmentation(cfg)
    args = (b.feats, list(b.points), list(b.edges_self), list(b.edges_forward),
            list(b.edges_propagate), list(b.norms))
    vs = model.init(jax.random.PRNGKey(0), *args, masks=list(b.masks), train=False)
    logits = model.apply(vs, *args, masks=list(b.masks), train=False)
    assert logits.shape == (b.points[0].shape[0], cfg.num_classes)

    def loss_fn(params):
        out, _ = model.apply({"params": params, "batch_stats": vs["batch_stats"]},
                             *args, masks=list(b.masks), train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        loss, _ = cross_entropy_loss(out, b.labels, mask=b.masks[0])
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(vs["params"])
    assert bool(jnp.isfinite(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    # something must actually receive gradient
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


@pytest.mark.parametrize("variant", [
    {},  # PCF + guided_level=0: PCFLayer + PointConvTransposePE branches
    {"guided_level": 1},  # + strided PointConvStridePE branch of maybe_remat
    {"transformer_type": "PointTransformer"},  # train at call position 7
])
def test_remat_layers_matches_plain(packed_batch, variant):
    """cfg.remat_layers must be a pure memory knob: identical param tree,
    logits, and gradients vs the un-rematted model (backbone.maybe_remat).
    Parametrized so every maybe_remat class branch is covered (PCFLayer /
    PointConvStridePE / PointTransformerLayer / PointConvTransposePE)."""
    b = packed_batch
    args = (b.feats, list(b.points), list(b.edges_self), list(b.edges_forward),
            list(b.edges_propagate), list(b.norms))

    def run(**kw):
        cfg = tiny_cfg(**kw)
        model = PointConvFormer_Segmentation(cfg)
        vs = model.init(jax.random.PRNGKey(0), *args, masks=list(b.masks),
                        train=False)

        def loss_fn(params):
            out, _ = model.apply(
                {"params": params, "batch_stats": vs["batch_stats"]},
                *args, masks=list(b.masks), train=True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(1)})
            loss, _ = cross_entropy_loss(out, b.labels, mask=b.masks[0])
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(vs["params"])
        logits = model.apply(vs, *args, masks=list(b.masks), train=False)
        return vs, logits, loss, grads

    vs0, logits0, loss0, grads0 = run(**variant)
    vs1, logits1, loss1, grads1 = run(remat_layers=True, **variant)

    paths0 = jax.tree_util.tree_structure(vs0["params"])
    paths1 = jax.tree_util.tree_structure(vs1["params"])
    assert paths0 == paths1, "remat_layers changed the parameter tree"
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits1),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(loss0), float(loss1), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                                rtol=1e-4, atol=1e-5),
        grads0, grads1)

    # remat_deconv (r5: decoder transpose-convs only) — same purity contract
    vs2, logits2, loss2, grads2 = run(remat_deconv=True, **variant)
    assert paths0 == jax.tree_util.tree_structure(vs2["params"])
    np.testing.assert_allclose(np.asarray(logits0), np.asarray(logits2),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(float(loss0), float(loss2), rtol=1e-6)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                                rtol=1e-4, atol=1e-5),
        grads0, grads2)


def test_segmentation_jit_compiles(packed_batch):
    """The full forward must be one compilable XLA program (static shapes)."""
    b = packed_batch
    cfg = tiny_cfg()
    model = PointConvFormer_Segmentation(cfg)
    args = (b.feats, list(b.points), list(b.edges_self), list(b.edges_forward),
            list(b.edges_propagate), list(b.norms))
    vs = model.init(jax.random.PRNGKey(0), *args, masks=list(b.masks), train=False)

    @jax.jit
    def fwd(params, batch_stats, feats):
        return model.apply({"params": params, "batch_stats": batch_stats},
                           feats, *args[1:], masks=list(b.masks), train=False)

    logits = fwd(vs["params"], vs["batch_stats"], b.feats)
    logits2 = fwd(vs["params"], vs["batch_stats"], b.feats)
    np.testing.assert_allclose(np.asarray(logits), np.asarray(logits2))


def test_model_zoo_configs():
    """Zoo constructors populate the reference's capacity grid
    (model_architecture.py:248-342)."""
    m, cfg = PCF_Tiny(0.1)
    assert cfg.num_heads == 1 and cfg.resblocks == [0, 1, 1, 1, 1]
    assert cfg.mid_dim == [4] * 5 and cfg.grid_size[-1] == pytest.approx(1.6)
    m, cfg = PCF_Small(0.1)
    assert cfg.num_heads == 8 and cfg.resblocks == [0, 2, 2, 2, 2]
    m, cfg = PCF_Normal(0.1)
    assert cfg.mid_dim == [16] * 5 and cfg.resblocks == [0, 2, 4, 6, 6]
    m, cfg = PCF_Large(0.1)
    assert cfg.num_level == 6 and len(cfg.grid_size) == 6
    assert cfg.grid_size[1] == pytest.approx(0.25)


def test_transformer_ablation(packed_batch):
    """transformer_type != 'PCF' swaps in PointTransformerLayer
    (model_architecture.py:138-149)."""
    b = packed_batch
    cfg = tiny_cfg(transformer_type="PointTransformer")
    model = PCF_Backbone(cfg)
    vs = model.init(jax.random.PRNGKey(0), b.feats, list(b.points),
                    list(b.edges_self), list(b.edges_forward), list(b.norms),
                    masks=list(b.masks), train=False)
    feat_list = model.apply(vs, b.feats, list(b.points), list(b.edges_self),
                            list(b.edges_forward), list(b.norms),
                            masks=list(b.masks), train=False)
    assert feat_list[-1].shape[-1] == cfg.feat_dim[2]


def test_qk_attention_variant(packed_batch):
    b = packed_batch
    cfg = tiny_cfg(attention_type="QK")
    model = PCF_Backbone(cfg)
    vs = model.init(jax.random.PRNGKey(0), b.feats, list(b.points),
                    list(b.edges_self), list(b.edges_forward), list(b.norms),
                    masks=list(b.masks), train=False)
    out = model.apply(vs, b.feats, list(b.points), list(b.edges_self),
                      list(b.edges_forward), list(b.norms),
                      masks=list(b.masks), train=False)
    assert bool(jnp.isfinite(out[-1][b.masks[-1]]).all())
