"""Scale proof at the hardest published configs (VERDICT r1 #4).

Modes:
  2cm    configPCF_2cm_PTF2 analog (/root/reference/configs/configPCF_2cm_PTF2.yaml:
         4,22,55 — the repo's published-74.4%-mIoU config): 120k points/scene
         (MAX_POINTS_NUM), 5 levels at [0.02,0.06,0.15,0.375,0.9375],
         feat_dim up to 384, AdamW + accum_iter 5.
  large  PCF_Large (model_architecture.py:330-341): 6 levels, 2.5x grid
         multipliers, segmentation head on top.

Measures eval forward + full train step (loss+grads+optimizer+BN) and the
HBM high-water mark on one chip with synthetic surface-like scenes at the
config's own geometry. Usage:
  python benchmarks/scale_bench.py --mode 2cm [--dtype bfloat16] [--window]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def _derive_window_sizes(scenes, tile=128, margin=1.3):
    """Measured per-kind tile-unique maxima of THESE scenes + margin,
    rounded to 128 (the inline analog of data/scannet.estimate_window_sizes)."""
    import numpy as np

    from pcf_tpu.ops.window import max_window_uniques

    sizes = []
    for key in ("nei_self_list", "nei_forward_list", "nei_propagate_list"):
        mx = max(max_window_uniques(np.asarray(e), tile)
                 for s in scenes for e in s[key])
        sizes.append(-(-int(mx * margin) // 128) * 128)
    return tuple(sizes)


def build_case(mode: str, n_points: int, n_scenes: int, window: bool,
               extent: float):
    import numpy as np

    from pcf_tpu.config import Config, get_default_training_cfgs, load_config
    from pcf_tpu.core import pack_scenes
    from pcf_tpu.data import synthetic_scene
    from pcf_tpu.data.pyramid import scene_to_item

    if mode == "2cm":
        cfg = load_config("pcf_tpu/configs/pcf_2cm_ptf2.yaml")
    else:
        from pcf_tpu.models.zoo import PCF_Large

        _, cfg = PCF_Large(0.02)
        cfg = get_default_training_cfgs(cfg)
        cfg.update(num_classes=20, USE_PE=True, optimizer="AdamW",
                   adamw_decay=0.05, learning_rate=0.01, accum_iter=1,
                   scheduler="MultiStepWithWarmup", milestones=[100],
                   warmup_epochs=1, bucket_multiple=8192)
    K = cfg.get("K_self", 16)
    K = K[0] if isinstance(K, (list, tuple)) else int(K)

    scenes = []
    for i in range(n_scenes):
        coord, norm, feats, labels = synthetic_scene(
            n_points, extent=extent, n_patches=48, seed=i)
        scenes.append(scene_to_item(
            coord, norm, feats, labels, cfg.grid_size, K, K, K,
            rng=np.random.default_rng(i), morton=window))
    level_sizes = [tuple(s["point_list"][l].shape[0]
                         for l in range(len(cfg.grid_size))) for s in scenes]
    window_sizes = _derive_window_sizes(scenes) if window else None
    batch = pack_scenes(scenes, bucket_multiple=cfg.bucket_multiple,
                        window_tile=128 if window else None,
                        window_sizes=window_sizes)
    return cfg, batch, level_sizes, window_sizes


def run_aot(args):
    """Deviceless TPU scale proof: compile the eval forward and the full
    train step against a v5e compile-only topology (local libtpu, no chip /
    relay needed) and report XLA's exact static HBM analysis. Array state
    lives on the CPU backend; only the executables target TPU."""
    import jax
    from jax.experimental import topologies

    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_train_step
    from pcf_tpu.train.state import create_train_state, make_optimizer
    from pcf_tpu.utils.memory import compiled_memory_gib

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    dev = topo.devices[0]

    cfg, batch, level_sizes, window_sizes = build_case(
        args.mode, args.points, args.scenes, args.window, args.extent)
    cfg.compute_dtype = args.dtype
    cfg.USE_PALLAS_KERNEL = args.pallas
    cfg.window_gather = args.window
    cfg.remat_blocks = args.remat
    cfg.remat_layers = args.remat_layers
    print(f"mode={args.mode} per-scene level sizes: {level_sizes}")
    print(f"packed caps: {[int(p_.shape[0]) for p_ in batch.points]}"
          + (f" window_sizes={window_sizes}" if window_sizes else ""))

    model = PointConvFormer_Segmentation(cfg)

    def apply(v, b, train, **kw):
        return model.apply(v, b.feats, list(b.points), list(b.edges_self),
                           list(b.edges_forward), list(b.edges_propagate),
                           list(b.norms), masks=list(b.masks), train=train,
                           **kw)

    variables = jax.jit(
        lambda k, b: model.init(
            k, b.feats, list(b.points), list(b.edges_self),
            list(b.edges_forward), list(b.edges_propagate), list(b.norms),
            masks=list(b.masks), train=False)
    )(jax.random.PRNGKey(0), batch)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))
    valid = int(batch.masks[0].sum())

    tx, _ = make_optimizer(cfg, iter_per_epoch=100)
    state = create_train_state(variables, tx)
    rng = jax.random.PRNGKey(2)
    if args.spatial:
        import numpy as np
        from jax.sharding import Mesh

        from pcf_tpu.parallel import (make_spatial_eval_step,
                                      make_spatial_train_step)

        mesh = Mesh(np.array(topo.devices[:args.spatial]), ("space",))
        fwd_c = make_spatial_eval_step(cfg, mesh).lower(
            state, batch).compile()
        step_c = make_spatial_train_step(cfg, tx, mesh).lower(
            state, batch, rng).compile()
    else:
        fwd_c = jax.jit(lambda v, b: apply(v, b, False),
                        device=dev).lower(variables, batch).compile()
        step_c = jax.jit(make_train_step(model, tx, cfg, mesh=None),
                         device=dev).lower(state, batch, rng).compile()

    def flops(c):
        try:
            ca = c.cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:
            return 0.0

    mem_e = compiled_memory_gib(fwd_c) or {}
    mem_t = compiled_memory_gib(step_c) or {}
    out = {
        "mode": args.mode, "aot": True, "target": "v5e (compile-only)",
        "points_per_scene": args.points, "scenes": args.scenes,
        "valid_points": valid, "n_params": n_params,
        "compute_dtype": args.dtype, "window_gather": args.window,
        "use_pallas": args.pallas, "spatial_chips": args.spatial or 1,
        "eval_gflops": round(flops(fwd_c) / 1e9, 1),
        "train_gflops": round(flops(step_c) / 1e9, 1),
        "hbm_eval_gib": round(mem_e.get("total_gib", 0.0), 3),
        "hbm_train_gib": round(mem_t.get("total_gib", 0.0), 3),
        "hbm_train_temp_gib": round(mem_t.get("temp_gib", 0.0), 3),
        "hbm_limit_gib": 16.0,
    }
    print(json.dumps(out))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=["2cm", "large"], default="2cm")
    p.add_argument("--points", type=int, default=120000,
                   help="raw points per scene (2cm MAX_POINTS_NUM: 120000)")
    p.add_argument("--scenes", type=int, default=2,
                   help="scenes per batch (2cm BATCH_SIZE: 2)")
    p.add_argument("--extent", type=float, default=7.0,
                   help="scene extent (m); 7m x 120k pts ~ 2cm scan density")
    p.add_argument("--dtype", default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--window", action="store_true")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--aot", action="store_true",
                   help="deviceless TPU AOT compile (local libtpu): exact "
                        "HBM analysis + compile proof without a chip; no "
                        "timing. Run with JAX_PLATFORMS=cpu.")
    p.add_argument("--remat", action="store_true",
                   help="cfg.remat_blocks: recompute residual blocks in the "
                        "backward (memory knob, measured speed-neutral)")
    p.add_argument("--remat-layers", action="store_true",
                   help="cfg.remat_layers: also recompute the strided/deconv "
                        "layer bodies (models/backbone.maybe_remat) — needed "
                        "for the 2cm/Large configs on a 16 GiB v5e")
    p.add_argument("--spatial", type=int, default=0, metavar="N",
                   help="(--aot only) shard the batch's point dim over an "
                        "N-chip mesh (parallel/spatial.py) and report the "
                        "PER-CHIP footprint of the sharded train step")
    args = p.parse_args()

    import os

    if args.aot:
        os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
        os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
        os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if args.aot:
        run_aot(args)
        return

    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_train_step
    from pcf_tpu.train.state import create_train_state, make_optimizer
    from pcf_tpu.utils.memory import compiled_memory_gib, hbm_stats
    from pcf_tpu.utils.timing import readback_overhead, time_fn

    cfg, batch, level_sizes, window_sizes = build_case(
        args.mode, args.points, args.scenes, args.window, args.extent)
    cfg.compute_dtype = args.dtype
    cfg.USE_PALLAS_KERNEL = args.pallas
    cfg.window_gather = args.window
    cfg.remat_blocks = args.remat
    cfg.remat_layers = args.remat_layers
    print(f"mode={args.mode} per-scene level sizes: {level_sizes}")
    print(f"packed caps: {[int(p_.shape[0]) for p_ in batch.points]}"
          + (f" window_sizes={window_sizes}" if window_sizes else ""))

    model = PointConvFormer_Segmentation(cfg)

    def apply(v, b, train, **kw):
        return model.apply(v, b.feats, list(b.points), list(b.edges_self),
                           list(b.edges_forward), list(b.edges_propagate),
                           list(b.norms), masks=list(b.masks), train=train,
                           **kw)

    variables = jax.jit(
        lambda k, b: model.init(
            k, b.feats, list(b.points), list(b.edges_self),
            list(b.edges_forward), list(b.edges_propagate), list(b.norms),
            masks=list(b.masks), train=False)
    )(jax.random.PRNGKey(0), batch)
    _, upd = jax.jit(
        lambda v, b: apply(v, b, True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
    )(variables, batch)
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(
        variables["params"]))

    ov = readback_overhead()
    valid = int(batch.masks[0].sum())

    fwd = jax.jit(lambda v, b: apply(v, b, False))
    fwd_c = fwd.lower(variables, batch).compile()
    t_eval = time_fn(fwd, variables, batch, iters=args.iters, overhead=ov)

    tx, _ = make_optimizer(cfg, iter_per_epoch=100)
    state = create_train_state(variables, tx)
    step = jax.jit(make_train_step(model, tx, cfg, mesh=None))
    rng = jax.random.PRNGKey(2)
    step_c = step.lower(state, batch, rng).compile()

    def run_step(s, b, r):
        new_s, metrics = step_c(s, b, r)
        return metrics["loss"]

    t_train = time_fn(run_step, state, batch, rng, iters=args.iters,
                      overhead=ov)
    mem_e = compiled_memory_gib(fwd_c) or {}
    mem_t = compiled_memory_gib(step_c) or {}
    mem = hbm_stats() or {}
    out = {
        "mode": args.mode,
        "dtype": args.dtype,
        "window": args.window,
        "pallas": args.pallas,
        "params_m": round(n_params / 1e6, 2),
        "valid_points": valid,
        "accum_iter": int(cfg.get("accum_iter", 1)),
        "eval_ms": round(t_eval * 1e3, 2),
        "eval_pts_per_sec": round(valid / t_eval, 1),
        "train_ms_per_micro_step": round(t_train * 1e3, 2),
        "train_pts_per_sec": round(valid / t_train, 1),
        "hbm_eval_gib": round(mem_e.get("total_gib", 0.0), 3),
        "hbm_train_gib": round(mem_t.get("total_gib", 0.0), 3),
        "hbm_train_temp_gib": round(mem_t.get("temp_gib", 0.0), 3),
        "hbm_limit_gib": round(mem.get("bytes_limit", 0) / 1024**3, 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
