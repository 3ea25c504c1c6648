"""Classification model: end-to-end train on synthetic shapes (the
ModelNet10-style accuracy check, reference tests_pointconv/test_modelnet10.py
at pytest scale: accuracy on separable synthetic classes must beat chance)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pcf_tpu.config import Config, get_default_configs
from pcf_tpu.core import pack_scenes
from pcf_tpu.data.pyramid import scene_to_item
from pcf_tpu.models.classification import PointConvFormer_Classification

GRID = [0.2, 0.4]


def _shape_cloud(kind: str, n: int, rng):
    """Two separable shape classes: sphere surface vs flat disk."""
    if kind == "sphere":
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = v.astype(np.float32)
        norms = pts.copy()
    else:  # disk
        ang = rng.uniform(0, 2 * np.pi, n)
        r = np.sqrt(rng.uniform(0, 1, n))
        pts = np.stack([r * np.cos(ang), r * np.sin(ang),
                        rng.normal(0, 0.02, n)], 1).astype(np.float32)
        norms = np.tile([0, 0, 1.0], (n, 1)).astype(np.float32)
    return pts, norms


def _make_batch(labels, rng, caps):
    scenes = []
    for y in labels:
        pts, norms = _shape_cloud("sphere" if y else "disk", 120, rng)
        feats = np.ones((120, 3), np.float32)
        item = scene_to_item(pts, norms, feats, np.full(120, y, np.int64),
                             GRID, 8, 8, 8, rng=rng)
        scenes.append(item)
    return pack_scenes(scenes, level_caps=caps)


def test_classification_learns_shapes():
    cfg = get_default_configs(Config(), num_level=2, base_dim=8)
    cfg.update(guided_level=0, num_heads=2, resblocks=[0, 1], mid_dim=[4, 4],
               grid_size=GRID, num_classes=2, USE_PE=True, BATCH_SIZE=4,
               dropout_fc=0.0, max_clouds=4)
    rng = np.random.default_rng(0)
    caps = [1024, 512]

    model = PointConvFormer_Classification(cfg)
    y0 = np.array([0, 1, 0, 1])
    b = _make_batch(y0, rng, caps)
    args = lambda b: (b.feats, list(b.points), list(b.edges_self),
                      list(b.edges_forward), list(b.norms))
    vs = model.init(jax.random.PRNGKey(0), *args(b), masks=list(b.masks),
                    bids=b.bids[-1], train=False)
    assert vs["params"]  # built

    tx = optax.adam(1e-2)
    opt_state = tx.init(vs["params"])
    params, bs = vs["params"], vs["batch_stats"]

    def loss_fn(p, bs, batch, y):
        logits, upd = model.apply(
            {"params": p, "batch_stats": bs}, *args(batch),
            masks=list(batch.masks), bids=batch.bids[-1], train=True,
            mutable=["batch_stats"], rngs={"dropout": jax.random.PRNGKey(0)})
        l = optax.softmax_cross_entropy_with_integer_labels(
            logits, jnp.asarray(y)).mean()
        return l, (upd["batch_stats"], logits)

    step = jax.jit(lambda p, bs, batch, y: jax.value_and_grad(
        loss_fn, has_aux=True)(p, bs, batch, y))

    losses = []
    for i in range(60):
        y = np.asarray(rng.integers(0, 2, 4))
        batch = _make_batch(y, rng, caps)
        (l, (bs, logits)), g = step(params, bs, batch, y)
        updates, opt_state = tx.update(g, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(l))

    # evaluate on fresh batches
    correct = total = 0
    for i in range(8):
        y = np.asarray(rng.integers(0, 2, 4))
        batch = _make_batch(y, rng, caps)
        logits = model.apply({"params": params, "batch_stats": bs},
                             *args(batch), masks=list(batch.masks),
                             bids=batch.bids[-1], train=False)
        correct += int((np.asarray(logits).argmax(-1) == y).sum())
        total += 4
    acc = correct / total
    assert acc >= 0.75, (acc, losses[:3], losses[-3:])
