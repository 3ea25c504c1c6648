"""Simple (single-pass) ScanNet evaluation with per-scene timing.

Rebuild of test_ScanNet_simple.py: loads a checkpoint, runs each scene once
through the eval forward (running-BN stats — the reference fuses BN into the
linears at this point, test_ScanNet_simple.py:139-142; under jit the affine
constant-folds, so no explicit fusion pass is needed), times the forward,
and writes softmax probs (.npy), colored predictions (.ply), benchmark label
files (.txt), and the class-IoU log.

Usage:
  python -m pcf_tpu.eval.simple --config <yaml> --pretrain_path <ckpt> [--split validation]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from pcf_tpu.config import load_config
from pcf_tpu.utils.logger import get_logger


def evaluate(cfg, pretrain_path: str | None = None, split: str = "validation",
             state=None, max_scenes: int | None = None,
             write_outputs: bool = True):
    import jax
    import jax.numpy as jnp

    from pcf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(cfg)

    from pcf_tpu.core.batching import pack_scenes
    from pcf_tpu.data.scannet import ScanNetDataset
    from pcf_tpu.eval.io import write_labels_txt, write_ply_color
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.train.checkpoint import CheckpointManager
    from pcf_tpu.train.metrics import intersection_and_union

    eval_dir = cfg.get("eval_path", "./experiments/eval_artifacts/evaluation")
    os.makedirs(eval_dir, exist_ok=True)
    logger = get_logger(eval_dir)

    dataset = ScanNetDataset(cfg, split=split, seed=cfg.manual_seed)
    if cfg.get("window_gather") and not cfg.get("window_sizes"):
        # derive window sizes exactly the way getdataLoaders does at train
        # time — never rely silently on the built-in defaults for a dataset
        # they were not measured on (ADVICE r1)
        from pcf_tpu.data.scannet import estimate_window_sizes

        cfg.window_sizes = estimate_window_sizes(
            [dataset], sample=cfg.get("level_caps_sample", 16),
            margin=cfg.get("window_margin", 1.3),
            tile=cfg.get("window_tile", 128), seed=cfg.manual_seed)
        logger.info(f"derived window_sizes {tuple(cfg.window_sizes)}")
    model = PointConvFormer_Segmentation(cfg)

    @jax.jit
    def fwd(variables, feats, points, edges_self, edges_forward,
            edges_propagate, norms, masks):
        return model.apply(variables, feats, points, edges_self, edges_forward,
                           edges_propagate, norms, masks=masks, train=False)

    variables = None
    if state is not None:
        variables = {"params": state.params, "batch_stats": state.batch_stats}
    inter_sum = np.zeros(cfg.num_classes)
    union_sum = np.zeros(cfg.num_classes)
    target_sum = np.zeros(cfg.num_classes)
    times = []

    n = len(dataset) if max_scenes is None else min(max_scenes, len(dataset))
    for idx in range(n):
        item = dataset[idx]
        from pcf_tpu.ops.window import WindowOverflow

        def _pack(window_tile):
            return pack_scenes([item], bucket_multiple=cfg.bucket_multiple,
                               ignore_label=cfg.ignore_label,
                               window_tile=window_tile,
                               window_sizes=cfg.get("window_sizes"))

        device_prep = cfg.get("post_knn") or cfg.get("device_pyramid")
        try:
            # device-prep items carry no host edges yet, so window packing
            # (which tiles host edge arrays) does not apply
            batch = _pack(cfg.get("window_tile", 128)
                          if cfg.get("window_gather") and not device_prep
                          else None)
        except WindowOverflow as e:  # rare outlier scene: degrade, not die
            logger.warning(f"window overflow on scene {idx} ({e}); "
                           "falling back to plain edges")
            batch = _pack(None)
        if device_prep:
            # on-device pyramid/edges (the dataset shipped level 0 only) —
            # same path as the trainer's _post_knn_fn; moves the dominant
            # per-scene host cost (subsample + kNN) onto the chip
            from pcf_tpu.data.post_knn import prepare as _prepare
            batch = _prepare(batch, cfg)
        if variables is None:
            # initialize template, then restore the checkpoint into it
            variables = jax.jit(lambda k: model.init(
                k, batch.feats, list(batch.points), list(batch.edges_self),
                list(batch.edges_forward), list(batch.edges_propagate),
                list(batch.norms), masks=list(batch.masks), train=False)
            )(jax.random.PRNGKey(0))
            if pretrain_path:
                # optimizer-independent restore: eval must not care how the
                # checkpoint's opt_state tree was shaped
                params, batch_stats, ep = CheckpointManager(
                    pretrain_path).restore_eval()
                assert params is not None, \
                    f"no checkpoint found at {pretrain_path}"
                variables = {"params": params, "batch_stats": batch_stats}
                logger.info(f"restored checkpoint from {pretrain_path} (epoch {ep})")

        args = (batch.feats, list(batch.points), list(batch.edges_self),
                list(batch.edges_forward), list(batch.edges_propagate),
                list(batch.norms), list(batch.masks))
        jax.block_until_ready(fwd(variables, *args))  # warm/compile this bucket
        t0 = time.perf_counter()
        logits = fwd(variables, *args)
        logits.block_until_ready()
        times.append(time.perf_counter() - t0)

        valid = np.asarray(batch.masks[0])
        probs = np.asarray(jax.nn.softmax(logits, axis=-1))[valid]
        pred = probs.argmax(-1)
        labels = np.asarray(batch.labels)[valid]

        i, u, t = intersection_and_union(
            jnp.asarray(pred), jnp.asarray(labels), cfg.num_classes,
            cfg.ignore_label)
        inter_sum += np.asarray(i)
        union_sum += np.asarray(u)
        target_sum += np.asarray(t)

        name = os.path.basename(str(dataset.scene_name(idx)))
        if write_outputs:
            np.save(os.path.join(eval_dir, f"{name}_probs.npy"), probs)
            write_ply_color(os.path.join(eval_dir, f"{name}.ply"),
                            np.asarray(batch.points[0])[valid], pred)
            write_labels_txt(os.path.join(eval_dir, f"{name}.txt"), pred)
        logger.info(f"{idx + 1}/{n} {name}: {times[-1] * 1000:.1f}ms, "
                    f"{int(valid.sum())} pts")

    iou = inter_sum / np.maximum(union_sum, 1)
    miou = float(iou.mean())
    logger.info(f"Average running time per frame: {np.mean(times):.4f}s")
    logger.info(f"mIoU: {miou:.4f}")
    for c in range(cfg.num_classes):
        cname = cfg.get("classes", [str(i) for i in range(cfg.num_classes)])[c]
        logger.info(f"Class {cname}: iou {iou[c]:.4f}")
    return miou, np.mean(times)


if __name__ == "__main__":
    p = argparse.ArgumentParser("pcf_tpu simple eval")
    p.add_argument("--config", required=True)
    p.add_argument("--pretrain_path", default=None)
    p.add_argument("--split", default="validation")
    p.add_argument("--set", dest="overrides", action="append", default=[],
                   metavar="KEY=VALUE", help="config override (repeatable)")
    a = p.parse_args()
    evaluate(load_config(a.config, a.overrides), a.pretrain_path, a.split)
