"""Classification train-to-accuracy proof (VERDICT r2 weak #6).

The reference's only accuracy-level e2e check is training a PointConv
classifier on ModelNet10 (tests_pointconv/test_modelnet10.py:307-450).
ModelNet10 isn't available in this environment, so the analog is a 4-class
synthetic shape benchmark (sphere / disk / cube / cylinder surfaces, with
random rotation, anisotropic scale and jitter) — geometry classes that
require the conv stack to read curvature and normal structure, not point
count. PointConvFormer_Classification (packed multi-cloud batches, masked
segment max-pool) trains with Adam and must reach >= 90% held-out accuracy.

Usage: python benchmarks/classify_proof.py [--steps 300] [--target 0.9]
Prints one JSON line; exit 1 if the target is missed.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

GRID = [0.25, 0.5, 1.0]
N_PTS = 256
CLASSES = ("sphere", "disk", "cube", "cylinder")


def _shape_cloud(kind: str, n: int, rng):
    if kind == "sphere":
        v = rng.normal(size=(n, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts, norms = v, v.copy()
    elif kind == "disk":
        ang = rng.uniform(0, 2 * np.pi, n)
        r = np.sqrt(rng.uniform(0, 1, n))
        pts = np.stack([r * np.cos(ang), r * np.sin(ang), np.zeros(n)], 1)
        norms = np.tile([0.0, 0.0, 1.0], (n, 1))
    elif kind == "cube":
        face = rng.integers(0, 6, n)
        uv = rng.uniform(-1, 1, (n, 2))
        pts = np.zeros((n, 3))
        norms = np.zeros((n, 3))
        ax, sign = face % 3, np.where(face < 3, 1.0, -1.0)
        for a in range(3):
            m = ax == a
            others = [i for i in range(3) if i != a]
            pts[m, a] = sign[m]
            pts[m, others[0]] = uv[m, 0]
            pts[m, others[1]] = uv[m, 1]
            norms[m, a] = sign[m]
    else:  # cylinder (open tube)
        ang = rng.uniform(0, 2 * np.pi, n)
        z = rng.uniform(-1, 1, n)
        pts = np.stack([np.cos(ang), np.sin(ang), z], 1)
        norms = np.stack([np.cos(ang), np.sin(ang), np.zeros(n)], 1)
    return pts.astype(np.float32), norms.astype(np.float32)


def _augment(pts, norms, rng):
    """Random rotation + anisotropic scale + jitter (the test_modelnet10
    augmentation set, reference :340-360)."""
    a = rng.uniform(0, 2 * np.pi)
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    scale = rng.uniform(0.8, 1.25, 3).astype(np.float32)
    pts = (pts @ rot.T) * scale + rng.normal(0, 0.01, pts.shape).astype(np.float32)
    nr = (norms @ rot.T) / scale
    nr /= np.linalg.norm(nr, axis=1, keepdims=True) + 1e-9
    return pts, nr.astype(np.float32)


def make_batch(labels, rng, caps, pack_scenes, scene_to_item):
    scenes = []
    for y in labels:
        pts, norms = _shape_cloud(CLASSES[y], N_PTS, rng)
        pts, norms = _augment(pts, norms, rng)
        feats = np.ones((N_PTS, 3), np.float32)
        scenes.append(scene_to_item(pts, norms, feats,
                                    np.full(N_PTS, y, np.int64),
                                    GRID, 8, 8, 8, rng=rng))
    return pack_scenes(scenes, level_caps=caps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--target", type=float, default=0.9)
    ap.add_argument("--eval-batches", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from pcf_tpu.config import Config, get_default_configs
    from pcf_tpu.core import pack_scenes
    from pcf_tpu.data.pyramid import scene_to_item
    from pcf_tpu.models.classification import PointConvFormer_Classification

    B = args.batch
    cfg = get_default_configs(Config(), num_level=3, base_dim=16)
    cfg.update(guided_level=0, num_heads=4, resblocks=[0, 1, 1],
               mid_dim=[8, 8, 8], grid_size=GRID, num_classes=len(CLASSES),
               USE_PE=True, BATCH_SIZE=B, dropout_fc=0.2, max_clouds=B)
    caps = [B * 256, B * 128, B * 64]

    rng = np.random.default_rng(0)
    model = PointConvFormer_Classification(cfg)
    margs = lambda b: (b.feats, list(b.points), list(b.edges_self),
                       list(b.edges_forward), list(b.norms))

    y0 = np.asarray(rng.integers(0, len(CLASSES), B))
    b0 = make_batch(y0, rng, caps, pack_scenes, scene_to_item)
    vs = jax.jit(lambda k, b: model.init(
        k, *margs(b), masks=list(b.masks), bids=b.bids[-1], train=False)
    )(jax.random.PRNGKey(0), b0)

    sched = optax.cosine_decay_schedule(2e-3, args.steps)
    tx = optax.adam(sched)
    opt_state = tx.init(vs["params"])
    params, bs = vs["params"], vs["batch_stats"]

    def loss_fn(p, bs, batch, y, key):
        logits, upd = model.apply(
            {"params": p, "batch_stats": bs}, *margs(batch),
            masks=list(batch.masks), bids=batch.bids[-1], train=True,
            mutable=["batch_stats"], rngs={"dropout": key})
        l = optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
        return l, upd["batch_stats"]

    @jax.jit
    def train_step(p, bs, opt_state, batch, y, key):
        (l, bs), g = jax.value_and_grad(loss_fn, has_aux=True)(
            p, bs, batch, y, key)
        updates, opt_state = tx.update(g, opt_state, p)
        return optax.apply_updates(p, updates), bs, opt_state, l

    eval_fwd = jax.jit(lambda p, bs, b: model.apply(
        {"params": p, "batch_stats": bs}, *margs(b), masks=list(b.masks),
        bids=b.bids[-1], train=False))

    t0 = time.time()
    for i in range(args.steps):
        y = np.asarray(rng.integers(0, len(CLASSES), B))
        batch = make_batch(y, rng, caps, pack_scenes, scene_to_item)
        key = jax.random.fold_in(jax.random.PRNGKey(1), i)
        params, bs, opt_state, l = train_step(
            params, bs, opt_state, batch, jnp.asarray(y), key)
        if i % 50 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(l):.4f}", flush=True)
    train_s = time.time() - t0

    erng = np.random.default_rng(999)  # held-out shapes
    correct = total = 0
    for _ in range(args.eval_batches):
        y = np.asarray(erng.integers(0, len(CLASSES), B))
        batch = make_batch(y, erng, caps, pack_scenes, scene_to_item)
        pred = np.asarray(eval_fwd(params, bs, batch)).argmax(-1)
        correct += int((pred == y).sum())
        total += B
    acc = correct / total
    out = {"metric": "4-class shape classification accuracy (held out)",
           "accuracy": round(acc, 4), "target": args.target,
           "steps": args.steps, "train_seconds": round(train_s, 1),
           "classes": list(CLASSES), "n_eval": total}
    print(json.dumps(out))
    if acc < args.target:
        sys.exit(1)


if __name__ == "__main__":
    main()
