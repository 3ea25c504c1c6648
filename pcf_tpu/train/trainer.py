"""Training driver CLI.

TPU-native rebuild of train_ScanNet_DDP_WarmUP.py: same config surface and
training semantics (weighted smoothed CE, MultiStepWithWarmup/cosine
schedules stepped per iteration, grad clip + accumulation, IoU metrics
all-reduced across the mesh, checkpoint + best tracking) on a jit+shard_map
data-parallel step instead of DDP/NCCL.

Improvements over the reference (SURVEY.md §5): real resume (the reference
hardcodes init_epoch=0), Orbax checkpoints, and an optional jax.profiler
trace (cfg.profile_dir traces cfg.profile_steps steps of the first epoch).

Usage: python -m pcf_tpu.train.trainer --config pcf_tpu/configs/pcf_10cm.yaml
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from pcf_tpu.config import load_config
from pcf_tpu.train.metrics import AverageMeter
from pcf_tpu.utils.logger import get_logger


def build_mesh_and_cfg(cfg):
    """Decide the data mesh. sync_bn wires psum-BN via cfg.bn_axis_name."""
    import jax

    from pcf_tpu.parallel import make_mesh
    from pcf_tpu.parallel.mesh import AXIS

    n = cfg.get("data_parallel") or len(jax.devices())
    mesh = make_mesh(n) if n > 1 else None
    if mesh is not None:
        cfg.bn_axis_name = AXIS  # BN stats always psum'ed under DP (SyncBN)
        cfg.sync_bn = True
    return mesh


def _group_batches(loader, group: int, map_fn=None, pad_tail: bool = False):
    """Yield (batches, n_real): `group` consecutive packed batches (one per
    device) plus how many are real. With pad_tail the final partial group is
    padded by repeating its last batch (shapes are pinned under a mesh), so
    validation covers every scene; without it the tail is dropped (training)."""
    buf = []
    for b in loader:
        buf.append(b if map_fn is None else map_fn(b))
        if len(buf) == group:
            yield buf, group
            buf = []
    if buf and pad_tail:
        n_real = len(buf)
        buf.extend(buf[-1:] * (group - n_real))
        yield buf, n_real


def _post_knn_fn(cfg):
    """On-device kNN after batching (cfg.post_knn; reference wiring
    train_ScanNet_DDP_WarmUP.py:379-386)."""
    if not (cfg.get("post_knn") or cfg.get("device_pyramid")):
        return None
    from pcf_tpu.data.post_knn import prepare

    return lambda b: prepare(b, cfg)


def _log_static_hbm(step_fn, state, batch, rng, logger):
    """One-shot exact HBM high-water mark of the compiled train step.

    XLA preallocates a program's buffers, so the executable's own memory
    analysis IS the peak for that program — and unlike allocator stats
    (hbm_summary, logged per print_freq where available) it also works on
    proxied devices. Runs after the first step so .compile() is a
    compilation-cache hit, not a second compile."""
    try:
        from pcf_tpu.utils.memory import compiled_memory_gib
        mem = compiled_memory_gib(step_fn.lower(state, batch, rng).compile())
        if mem:
            logger.info(
                f"train-step HBM (static analysis): total {mem['total_gib']:.2f} "
                f"GiB (args {mem['args_gib']:.2f} + temps {mem['temp_gib']:.2f} "
                f"+ out {mem['output_gib']:.2f})")
    except Exception as e:  # never let observability kill training
        logger.info(f"static HBM analysis unavailable: {e}")


def train_one_epoch(step_fn, state, loader, mesh, epoch, cfg, logger, rng_seed):
    import jax
    import jax.numpy as jnp

    from pcf_tpu.parallel import stack_batches

    loss_meter = AverageMeter()
    inter_sum = np.zeros(cfg.num_classes)
    union_sum = np.zeros(cfg.num_classes)
    target_sum = np.zeros(cfg.num_classes)
    pending: list = []  # device-side metrics awaiting host readback

    def _flush():
        nonlocal inter_sum, union_sum, target_sum
        for m in pending:
            loss_meter.update(float(m["loss"]))
            inter_sum += np.asarray(m["intersection"])
            union_sum += np.asarray(m["union"])
            target_sum += np.asarray(m["target"])
        pending.clear()

    n_dev = mesh.size if mesh is not None else 1
    t0 = time.time()
    it = 0
    # optional profiler trace of the first epoch's steady-state steps
    profile_dir = cfg.get("profile_dir") if epoch == cfg.get("profile_epoch", 0) else None
    profile_steps = cfg.get("profile_steps", 5)
    tracing = False
    src = _group_batches(loader, n_dev, _post_knn_fn(cfg))
    for group, _ in src:
        if profile_dir and it == 1 and not tracing:
            jax.profiler.start_trace(profile_dir)
            tracing = True
        batch = stack_batches(list(group)) if mesh is not None else group[0]
        rng = jax.random.fold_in(jax.random.PRNGKey(rng_seed), epoch * 100000 + it)
        state, metrics = step_fn(state, batch, rng)
        if it == 0:
            _log_static_hbm(step_fn, state, batch, rng, logger)
        # Defer metric readback: converting metrics to host floats here
        # would SYNCHRONIZE every step, idling the chip while the (single)
        # host CPU packs the next batch. Metrics stay device arrays (a few
        # hundred bytes each) until a print boundary, so jax's async
        # dispatch pipelines host packing with device compute — the analog
        # of the reference's non-blocking CUDA streams.
        pending.append(metrics)
        it += 1
        if tracing and it > profile_steps:
            jax.block_until_ready(metrics["loss"])
            jax.profiler.stop_trace()
            tracing = False
        if it % cfg.print_freq == 0:
            _flush()
            miou = np.mean(inter_sum / np.maximum(union_sum, 1))
            # HBM in-use/peak per print-freq — the reference logs
            # torch.cuda.max_memory_reserved here (train_ScanNet_DDP_WarmUP.py:471)
            from pcf_tpu.utils.memory import hbm_summary
            mem = hbm_summary()
            logger.info(
                f"epoch {epoch} iter {it} loss {loss_meter.val:.4f} "
                f"(avg {loss_meter.avg:.4f}) mIoU {miou:.4f} "
                f"{(time.time() - t0) / it:.2f}s/it"
                + (f" {mem}" if mem else ""))
    if tracing:
        jax.profiler.stop_trace()
    _flush()
    miou = float(np.mean(inter_sum / np.maximum(union_sum, 1)))
    macc = float(np.mean(inter_sum / np.maximum(target_sum, 1)))
    allacc = float(inter_sum.sum() / max(target_sum.sum(), 1))
    return state, loss_meter.avg, miou, macc, allacc


def validate(eval_step, state, loader, mesh, cfg, logger):
    import jax.numpy as jnp

    from pcf_tpu.parallel import stack_batches
    from pcf_tpu.train.metrics import intersection_and_union

    inter_sum = np.zeros(cfg.num_classes)
    union_sum = np.zeros(cfg.num_classes)
    target_sum = np.zeros(cfg.num_classes)
    n_dev = mesh.size if mesh is not None else 1
    src = _group_batches(loader, n_dev, _post_knn_fn(cfg), pad_tail=True)
    pending = []  # device-side IoU histograms; defer readback (see train loop)
    for group, n_real in src:
        batch = stack_batches(list(group)) if mesh is not None else group[0]
        logits = eval_step(state, batch)
        if mesh is not None:
            for d in range(n_real):
                b = group[d]
                pred = jnp.argmax(logits[d], -1)
                pending.append(intersection_and_union(
                    pred, b.labels, cfg.num_classes,
                    cfg.ignore_label, mask=b.masks[0]))
        else:
            b = group[0]
            pred = jnp.argmax(logits, -1)
            pending.append(intersection_and_union(
                pred, b.labels, cfg.num_classes, cfg.ignore_label,
                mask=b.masks[0]))
    for i, u, t in pending:
        inter_sum += np.asarray(i)
        union_sum += np.asarray(u)
        target_sum += np.asarray(t)
    iou = inter_sum / np.maximum(union_sum, 1)
    miou = float(np.mean(iou))
    macc = float(np.mean(inter_sum / np.maximum(target_sum, 1)))
    allacc = float(inter_sum.sum() / max(target_sum.sum(), 1))
    logger.info(f"Val result: mIoU/mAcc/allAcc {miou:.4f}/{macc:.4f}/{allacc:.4f}")
    for c, v in enumerate(iou):
        logger.info(f"Class_{c} Result: iou {v:.4f}")
    return miou, macc, allacc


def main(cfg):
    # Multi-host bootstrap (reference analog: dist.init_process_group over
    # RANK/WORLD_SIZE env, train_ScanNet_DDP_WarmUP.py:153-166). JAX reads the
    # coordinator/process env itself; must run before any other jax call.
    if cfg.get("multi_host") or os.environ.get("COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()
    import jax

    # Persistent compilation cache: restarts/resumes skip the multi-minute
    # first compile of the train/eval steps (same setting bench.py uses).
    # Respects a user-configured cache dir (utils/cache.py).
    from pcf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(cfg)

    from pcf_tpu.data.scannet import getdataLoaders
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_eval_step, make_train_step
    from pcf_tpu.train.checkpoint import CheckpointManager
    from pcf_tpu.train.state import create_train_state, make_optimizer

    from pcf_tpu.utils.experiment import MetricsWriter, snapshot_code

    exp_dir = cfg.get("experiment_dir", "./experiment")
    os.makedirs(exp_dir, exist_ok=True)
    logger = get_logger(exp_dir, distributed_rank=jax.process_index())
    logger.info(f"devices: {jax.devices()}")
    if jax.process_index() == 0:
        # reproducibility snapshot (reference: code_log/, trainer :118-137)
        snapshot_code(exp_dir, cfg.get("config"))
    writer = MetricsWriter(exp_dir, cfg.get("use_tensorboard", False))

    mesh = build_mesh_and_cfg(cfg)
    if mesh is not None:
        # pinned global level caps: identical batch shapes across the mesh
        # (stack_batches requirement) and a single XLA compilation
        cfg.setdefault("pin_level_caps", True)
        # window overflow must not change the batch pytree structure under
        # pinned shapes — drop the rare offending scene instead of falling
        # back to plain edges (see PackedLoader._pack_with_policy)
        if cfg.get("window_gather"):
            cfg.setdefault("window_overflow", "drop")
    train_loader, val_loader, train_ds, _ = getdataLoaders(
        cfg, jax.process_index(), jax.process_count())

    model = PointConvFormer_Segmentation(cfg)

    # init from one real batch (jitted: eager init is pathological on TPU)
    first = next(iter(train_loader))
    pk = _post_knn_fn(cfg)
    if pk is not None:
        first = pk(first)
    variables = jax.jit(
        lambda k: model.init(
            k, first.feats, list(first.points), list(first.edges_self),
            list(first.edges_forward), list(first.edges_propagate),
            list(first.norms), masks=list(first.masks), train=False)
    )(jax.random.PRNGKey(cfg.manual_seed))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(variables["params"]))
    logger.info(f"model parameters: {n_params / 1e6:.2f}M")

    iter_per_epoch = max(len(train_loader) // (mesh.size if mesh else 1), 1)
    tx, schedule = make_optimizer(cfg, iter_per_epoch)
    state = create_train_state(variables, tx)

    ckpt = CheckpointManager(os.path.join(exp_dir, "model"))
    try:
        state, init_epoch = ckpt.restore(state)
    except Exception as e:
        # opt_state tree doesn't match (checkpoint from an older optimizer
        # formulation): warm-start weights + BN stats with a fresh optimizer
        # rather than refusing to train
        params, batch_stats, init_epoch = ckpt.restore_eval()
        if params is None:
            raise
        state = state.replace(params=params, batch_stats=batch_stats)
        logger.warning(
            f"full-state restore failed ({type(e).__name__}); warm-started "
            f"params/batch_stats from epoch {init_epoch} with a fresh "
            "optimizer state")
    if init_epoch:
        logger.info(f"resumed from epoch {init_epoch}")

    class_weights = cfg.get("weights") if cfg.USE_WEIGHT else None
    if cfg.get("spatial_train") and mesh is not None:
        # giant-scene mode: ONE batch per step, its point dim sharded over
        # the mesh (parallel/spatial.py) — instead of one scene per device.
        # The loop sees mesh=None: no batch grouping/stacking; the psums
        # live inside the sharded step.
        from pcf_tpu.parallel import (make_spatial_eval_step,
                                      make_spatial_train_step)

        step_fn = make_spatial_train_step(cfg, tx, mesh,
                                          class_weights=class_weights)
        eval_step = make_spatial_eval_step(cfg, mesh)
        mesh = None
    else:
        step_fn = make_train_step(model, tx, cfg, mesh=mesh,
                                  class_weights=class_weights)
        eval_step = make_eval_step(model, cfg, mesh=mesh)

    best_miou = 0.0
    for epoch in range(init_epoch, cfg.total_epoches):
        train_loader.set_epoch(epoch)
        logger.info(f"lr: {float(schedule(int(state.step))):.6f}")
        state, loss, miou, macc, allacc = train_one_epoch(
            step_fn, state, train_loader, mesh, epoch, cfg, logger,
            cfg.manual_seed)
        logger.info(
            f"Train epoch {epoch}: loss {loss:.4f} mIoU/mAcc/allAcc "
            f"{miou:.4f}/{macc:.4f}/{allacc:.4f}")
        writer.write(epoch, train_loss=loss, train_miou=miou,
                     train_macc=macc, train_allacc=allacc,
                     lr=float(schedule(int(state.step))))

        epoch_log = epoch + 1
        metrics = {}
        if epoch_log % cfg.eval_freq == 0:
            vmiou, vmacc, vallacc = validate(eval_step, state, val_loader, mesh, cfg, logger)
            metrics["miou"] = vmiou
            best_miou = max(best_miou, vmiou)
            writer.write(epoch, val_miou=vmiou, val_macc=vmacc,
                         val_allacc=vallacc)
        if epoch_log % cfg.save_freq == 0 and jax.process_index() == 0:
            ckpt.save(epoch_log, state, metrics)
            logger.info(f"saved checkpoint at epoch {epoch_log}")
    ckpt.close()
    writer.close()
    return state


if __name__ == "__main__":
    parser = argparse.ArgumentParser("pcf_tpu ScanNet training")
    parser.add_argument("--config", required=True)
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="KEY=VALUE", help="config override (repeatable)")
    args = parser.parse_args()
    main(load_config(args.config, args.overrides))
