"""Per-op device-time profile of the flagship eval/train step.

The reference ships an NVTX + peak-memory kernel profiler
(cpp_wrappers/cpp_pcf_kernel/profile.py); the TPU analog is a jax.profiler
trace. This script captures one and prints the top device ops by total
self-time — the tool behind every "profile showed ..." claim in RESULTS.md.

Usage: python benchmarks/profile_model.py [--train] [--window] [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
from collections import defaultdict

sys.path.insert(0, ".")


def summarize_trace(trace_dir: str, top: int = 40) -> None:
    paths = sorted(glob.glob(
        f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device-track pids: names like "/device:TPU:0" or "TPU:0 (pid ..)"
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name" and "args" in e}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n.upper() or "device" in n.lower()}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        tot[name] += e.get("dur", 0.0)
        cnt[name] += 1
    grand = sum(tot.values())
    print(f"device self-time total: {grand/1e3:.2f} ms "
          f"across {sum(cnt.values())} events")
    for name, t in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{t/1e3:9.3f} ms {cnt[name]:5d}x  {name[:110]}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--train", action="store_true")
    p.add_argument("--window", action="store_true")
    p.add_argument("--pallas", action="store_true")
    p.add_argument("--fused-eval", action="store_true")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--points", type=int, default=20000)
    p.add_argument("--scenes", type=int, default=2)
    p.add_argument("--out", default="/tmp/pcf_trace")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from benchmarks.model_bench import bench_config  # reuse setup path
    from __graft_entry__ import _flagship
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_train_step
    from pcf_tpu.train.state import create_train_state, make_optimizer

    cfg, batch = _flagship(level0_points=args.points, bucket=4096,
                           n_scenes=args.scenes, window_gather=args.window)
    cfg.USE_PALLAS_KERNEL = args.pallas
    cfg.fused_eval = args.fused_eval
    cfg.window_gather = args.window
    cfg.compute_dtype = args.dtype
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

    if args.train:
        tx, _ = make_optimizer(cfg, iter_per_epoch=100)
        _, upd = jax.jit(
            lambda v, b: apply(v, b, True, mutable=["batch_stats"],
                               rngs={"dropout": jax.random.PRNGKey(1)})
        )(variables, batch)
        variables = {"params": variables["params"],
                     "batch_stats": upd["batch_stats"]}
        state = create_train_state(variables, tx)
        step = jax.jit(make_train_step(model, tx, cfg, mesh=None))
        rng = jax.random.PRNGKey(2)
        state, m = step(state, batch, rng)  # compile
        jax.block_until_ready(m["loss"])
        with jax.profiler.trace(args.out):
            for _ in range(3):
                state, m = step(state, batch, rng)
            jax.block_until_ready(m["loss"])
    else:
        fwd = jax.jit(lambda v, b: apply(v, b, False))
        out = fwd(variables, batch)
        jax.block_until_ready(out)
        with jax.profiler.trace(args.out):
            for _ in range(3):
                out = fwd(variables, batch)
            jax.block_until_ready(out)

    summarize_trace(args.out, args.top)


if __name__ == "__main__":
    main()
