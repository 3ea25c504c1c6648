"""Model-level benchmark: flagship eval forward + train step, Pallas on/off.

The honest headline measurement (VERDICT r1 #3/#6): PCF_Normal-capacity
segmentation at 10cm-scale density on one chip, comparing the fused Pallas
kernel path (cfg.USE_PALLAS_KERNEL, the reference's USE_CUDA_KERNEL/PCONV_OPT
analog) against the XLA reference path, for BOTH inference and the full
training step (loss + grads + optimizer + BN stats). Reports points/sec and
achieved TFLOP/s from XLA's own cost analysis.

Usage: python benchmarks/model_bench.py [--points 20000] [--scenes 2]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")

# bf16 peak TFLOP/s per chip by device_kind (public spec sheets)
PEAK_TFLOPS = {"TPU v5 lite": 197.0, "TPU v5e": 197.0, "TPU v5p": 459.0,
               "TPU v4": 275.0, "TPU v6 lite": 918.0}


def _flops_of(compiled) -> float:
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0))
    except Exception:
        return 0.0


def bench_config(use_pallas: bool, level0_points: int, n_scenes: int,
                 compute_dtype: str = "float32", scan_resblocks: bool = True,
                 window: bool = False, remat: bool = False,
                 remat_layers: bool = False, remat_deconv: bool = False,
                 skip_train: bool = False,
                 fused_eval: bool = False, flat_geom: bool = False,
                 cm_geom: bool = False, resolve_impl: str = "xla"):
    import jax

    from __graft_entry__ import _flagship
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_train_step
    from pcf_tpu.train.state import create_train_state, make_optimizer
    from pcf_tpu.utils.timing import readback_overhead, time_fn

    cfg, batch = _flagship(level0_points=level0_points, bucket=4096,
                           n_scenes=n_scenes, window_gather=window)
    cfg.USE_PALLAS_KERNEL = use_pallas
    cfg.window_gather = window
    cfg.fused_eval = fused_eval
    cfg.flat_geom = flat_geom
    cfg.cm_geom = cm_geom
    cfg.resolve_impl = resolve_impl
    cfg.compute_dtype = compute_dtype
    cfg.scan_resblocks = scan_resblocks
    cfg.remat_blocks = remat
    cfg.remat_layers = remat_layers
    cfg.remat_deconv = remat_deconv
    model = PointConvFormer_Segmentation(cfg)

    # The batch (geometry included) is an ARGUMENT: closed-over points/edges
    # would be constant-folded by XLA, overstating eval ~1.5x (29 vs 45 ms).
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
    # one train-mode pass calibrates BN running stats (fresh mean0/var1
    # leaves eval activations unnormalized, same as torch BN at init)
    _, upd = jax.jit(
        lambda v, b: apply(v, b, True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
    )(variables, batch)
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}

    ov = readback_overhead()
    valid = int(batch.masks[0].sum())

    fwd = jax.jit(lambda v, b: apply(v, b, False))
    lowered = fwd.lower(variables, batch)
    compiled = lowered.compile()
    t_eval = time_fn(fwd, variables, batch, iters=10, overhead=ov)
    eval_flops = _flops_of(compiled)

    if skip_train:
        from pcf_tpu.utils.memory import compiled_memory_gib
        mem_e = compiled_memory_gib(compiled) or {}
        return {
            "hbm_eval_gib": mem_e.get("total_gib", 0.0),
            "use_pallas": use_pallas, "compute_dtype": compute_dtype,
            "window_gather": window, "n_scenes": n_scenes,
            "valid_points": valid,
            "eval_ms": t_eval * 1e3, "eval_pts_per_sec": valid / t_eval,
            "eval_tflops": eval_flops / t_eval / 1e12,
            "train_ms": 0.0, "train_pts_per_sec": 0.0, "train_tflops": 0.0,
        }

    tx, _ = make_optimizer(cfg, iter_per_epoch=100)
    state = create_train_state(variables, tx)
    step = make_train_step(model, tx, cfg, mesh=None)
    rng = jax.random.PRNGKey(2)
    step_c = jax.jit(step).lower(state, batch, rng).compile()
    train_flops = _flops_of(step_c)

    def run_step(s, b, r):
        new_s, metrics = step_c(s, b, r)
        return metrics["loss"]

    t_train = time_fn(run_step, state, batch, rng, iters=10, overhead=ov)
    # HBM high-water mark — the profile.py analog (VERDICT r1 #6). XLA's
    # static memory analysis of each compiled program is the exact per-program
    # peak (allocator stats are unavailable on proxied devices).
    from pcf_tpu.utils.memory import compiled_memory_gib
    mem_e = compiled_memory_gib(compiled) or {}
    mem_t = compiled_memory_gib(step_c) or {}
    return {
        "hbm_eval_gib": mem_e.get("total_gib", 0.0),
        "hbm_train_gib": mem_t.get("total_gib", 0.0),
        "hbm_train_temp_gib": mem_t.get("temp_gib", 0.0),
        "use_pallas": use_pallas,
        "compute_dtype": compute_dtype,
        "window_gather": window,
        "valid_points": valid,
        "eval_ms": t_eval * 1e3,
        "eval_pts_per_sec": valid / t_eval,
        "eval_tflops": eval_flops / t_eval / 1e12,
        "train_ms": t_train * 1e3,
        "train_pts_per_sec": valid / t_train,
        "train_tflops": train_flops / t_train / 1e12,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", type=int, default=20000)
    parser.add_argument("--scenes", type=int, default=2)
    parser.add_argument("--dtype", default="float32",
                        choices=["float32", "bfloat16"],
                        help="compute_dtype for activations (bf16 halves "
                             "gather HBM traffic on this gather-bound model)")
    parser.add_argument("--pallas", default="both",
                        choices=["both", "on", "off"])
    parser.add_argument("--window", action="store_true",
                        help="windowed dedup gather (ops/window.py): Morton-"
                             "sorted pipeline + per-tile window resolve")
    parser.add_argument("--unroll", action="store_true",
                        help="unroll residual stacks instead of nn.scan "
                             "(faster steps, slower compile)")
    parser.add_argument("--remat", action="store_true",
                        help="cfg.remat_blocks (train-step memory knob)")
    parser.add_argument("--remat-layers", action="store_true",
                        help="cfg.remat_layers (needed for train at "
                             "batch >= 8 on a 16 GiB v5e)")
    parser.add_argument("--remat-deconv", action="store_true",
                        help="cfg.remat_deconv (decoder transpose convs "
                             "only; measured +3.7 ms at flagship, r5)")
    parser.add_argument("--eval-only", action="store_true",
                        help="skip the train step (batch-sweep eval points)")
    parser.add_argument("--fused-eval", action="store_true",
                        help="whole-layer inference megakernel "
                             "(cfg.fused_eval; needs --window)")
    parser.add_argument("--flat-geom", action="store_true",
                        help="flat-lane stage geometry (cfg.flat_geom; "
                             "needs --window)")
    parser.add_argument("--cm-geom", action="store_true",
                        help="channel-major stage geometry (cfg.cm_geom; "
                             "needs --window)")
    parser.add_argument("--resolve", choices=["xla", "pallas"],
                        default="xla",
                        help="window-resolve implementation "
                             "(cfg.resolve_impl)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    kind = jax.devices()[0].device_kind
    peak = PEAK_TFLOPS.get(kind)
    print(f"device: {kind} (bf16 peak {peak} TFLOP/s)" if peak else
          f"device: {kind}")
    variants = {"both": (False, True), "on": (True,), "off": (False,)}
    rows = [bench_config(up, args.points, args.scenes, args.dtype,
                         scan_resblocks=not args.unroll, window=args.window,
                         remat=args.remat, remat_layers=args.remat_layers,
                         remat_deconv=args.remat_deconv,
                         skip_train=args.eval_only,
                         fused_eval=args.fused_eval, flat_geom=args.flat_geom,
                         cm_geom=args.cm_geom, resolve_impl=args.resolve)
            for up in variants[args.pallas]]
    for r in rows:
        mfu_e = f" ({r['eval_tflops']/peak*100:.1f}% MFU)" if peak else ""
        mfu_t = f" ({r['train_tflops']/peak*100:.1f}% MFU)" if peak else ""
        name = "Pallas-fused" if r["use_pallas"] else "XLA-reference"
        name += " bf16" if r["compute_dtype"] == "bfloat16" else ""
        name += " +win" if r.get("window_gather") else ""
        name += " +FE" if args.fused_eval else ""
        name += " +flat" if args.flat_geom else ""
        name += " +cm" if args.cm_geom else ""
        name += f" rs:{args.resolve}"
        if r.get("hbm_train_gib"):
            mfu_t += (f" | HBM eval {r['hbm_eval_gib']:.2f}"
                      f" train {r['hbm_train_gib']:.2f} GiB")
        print(f"{name:>14}: eval {r['eval_ms']:7.2f} ms "
              f"{r['eval_pts_per_sec']/1e6:6.3f} Mpts/s "
              f"{r['eval_tflops']:5.2f} TFLOP/s{mfu_e} | "
              f"train {r['train_ms']:7.2f} ms "
              f"{r['train_pts_per_sec']/1e6:6.3f} Mpts/s "
              f"{r['train_tflops']:5.2f} TFLOP/s{mfu_t}")
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
