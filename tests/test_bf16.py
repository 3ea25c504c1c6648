"""Mixed-precision (bf16 compute) path: runs, stays finite, and tracks the
f32 path closely. Params/BN stats remain f32 (no reference analog: the
reference trains f32-only; bf16 is the TPU-native speed path)."""

import jax
import jax.numpy as jnp
import numpy as np

from pcf_tpu.config import Config, get_default_configs
from pcf_tpu.core import pack_scenes
from pcf_tpu.data import synthetic_scene
from pcf_tpu.data.pyramid import scene_to_item
from pcf_tpu.models import PointConvFormer_Segmentation
from pcf_tpu.train.loss import cross_entropy_loss

GRID = [0.3, 0.6, 1.2]


def _cfg(**kw):
    cfg = get_default_configs(Config(), num_level=3, base_dim=8)
    cfg.update(guided_level=0, num_heads=2, resblocks=[0, 1, 1],
               mid_dim=[4, 4, 4], grid_size=GRID, num_classes=5, USE_PE=True)
    cfg.update(kw)
    return cfg


def test_bf16_forward_tracks_f32():
    coord, norm, feats, labels = synthetic_scene(250, extent=4.0, num_classes=5, seed=5)
    item = scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                         rng=np.random.default_rng(5))
    b = pack_scenes([item], bucket_multiple=128)
    args = (b.feats, list(b.points), list(b.edges_self), list(b.edges_forward),
            list(b.edges_propagate), list(b.norms))

    m32 = PointConvFormer_Segmentation(_cfg(compute_dtype="float32"))
    m16 = PointConvFormer_Segmentation(_cfg(compute_dtype="bfloat16"))
    vs = m32.init(jax.random.PRNGKey(0), *args, masks=list(b.masks), train=False)
    # identical param trees: dtype only changes computation
    vs16 = m16.init(jax.random.PRNGKey(0), *args, masks=list(b.masks), train=False)
    assert jax.tree_util.tree_structure(vs["params"]) == \
        jax.tree_util.tree_structure(vs16["params"])
    # params are f32 in both
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(vs16["params"]))

    # calibrate BN stats with one train pass so eval activations are sane
    _, upd = m32.apply(vs, *args, masks=list(b.masks), train=True,
                       mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(1)})
    vs_cal = {"params": vs["params"], "batch_stats": upd["batch_stats"]}

    out32 = m32.apply(vs_cal, *args, masks=list(b.masks), train=False)
    out16 = m16.apply(vs_cal, *args, masks=list(b.masks), train=False)
    mask = np.asarray(b.masks[0])
    a = np.asarray(out32)[mask]
    c = np.asarray(out16, dtype=np.float32)[mask]
    assert np.isfinite(c).all()
    # bf16 has ~3 decimal digits; logits should agree to ~1e-1 abs on this scale
    denom = np.maximum(np.abs(a).max(), 1.0)
    assert np.max(np.abs(a - c)) / denom < 0.15, np.max(np.abs(a - c))

    # argmax agreement on the vast majority of points
    agree = (a.argmax(-1) == c.argmax(-1)).mean()
    assert agree > 0.9, agree


def test_bf16_gradients_finite():
    coord, norm, feats, labels = synthetic_scene(200, extent=4.0, num_classes=5, seed=6)
    item = scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                         rng=np.random.default_rng(6))
    b = pack_scenes([item], bucket_multiple=128)
    args = (b.feats, list(b.points), list(b.edges_self), list(b.edges_forward),
            list(b.edges_propagate), list(b.norms))
    model = PointConvFormer_Segmentation(_cfg(compute_dtype="bfloat16"))
    vs = model.init(jax.random.PRNGKey(0), *args, masks=list(b.masks), train=False)

    def loss_fn(p):
        out, _ = model.apply({"params": p, "batch_stats": vs["batch_stats"]},
                             *args, masks=list(b.masks), train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        l, _ = cross_entropy_loss(out, b.labels, mask=b.masks[0])
        return l

    g = jax.grad(loss_fn)(vs["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert all(l.dtype == jnp.float32 for l in leaves)  # f32 master grads
