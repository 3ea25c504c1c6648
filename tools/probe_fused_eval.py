"""On-chip probe for the fused whole-layer inference megakernel.

Answers the two questions VERDICT r3 flagged (weak #6 / missing #1):
  1. Does the fused_eval gate actually FIRE at flagship shapes (or does
     cfg.fused_eval=True silently compile the standard path — the round-2
     "--pallas on used the kernel zero times" failure mode)?
  2. Does Mosaic compile the kernel at flagship shapes on the real chip,
     and what does it measure vs the XLA windowed path?

Counts fused_layer_eval invocations at trace time, asserts numeric parity
between the two compiled programs on the same variables, and times both.

Usage: python tools/probe_fused_eval.py [--points 20000] [--scenes 2]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", type=int, default=20000)
    parser.add_argument("--scenes", type=int, default=2)
    parser.add_argument("--dtype", default="bfloat16")
    parser.add_argument("--eval-repeats", type=int, default=5)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import numpy as np

    from __graft_entry__ import _flagship
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.utils.timing import readback_overhead, time_fn
    import pcf_tpu.nn.fused_eval as fe_mod

    # trace-time activation counter (VERDICT r3 weak #6)
    calls: list[tuple] = []
    real_fle = fe_mod.fused_layer_eval

    def counting_fle(feat_table, geo_table, edges, *a, **kw):
        calls.append((tuple(feat_table.shape), tuple(edges.nei.shape),
                      tuple(edges.window_rows.shape)))
        return real_fle(feat_table, geo_table, edges, *a, **kw)

    fe_mod.fused_layer_eval = counting_fle

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})")

    cfg, batch = _flagship(level0_points=args.points, bucket=4096,
                           n_scenes=args.scenes, window_gather=True)
    cfg.window_gather = True
    cfg.compute_dtype = args.dtype

    def build(fused_eval: bool):
        # each model gets its OWN config: flax modules hold the reference,
        # and both programs are traced lazily — a shared mutated cfg made
        # the "standard" path fire the kernel too
        import copy

        c = copy.deepcopy(cfg)
        c.fused_eval = fused_eval
        model = PointConvFormer_Segmentation(c)

        def apply(v, b):
            return model.apply(v, b.feats, list(b.points),
                               list(b.edges_self), list(b.edges_forward),
                               list(b.edges_propagate), list(b.norms),
                               masks=list(b.masks), train=False)
        return model, apply

    model, apply_ref = build(False)
    variables = jax.jit(
        lambda k, b: model.init(
            k, b.feats, list(b.points), list(b.edges_self),
            list(b.edges_forward), list(b.edges_propagate), list(b.norms),
            masks=list(b.masks), train=False)
    )(jax.random.PRNGKey(0), batch)
    _, upd = jax.jit(
        lambda v, b: model.apply(
            v, b.feats, list(b.points), list(b.edges_self),
            list(b.edges_forward), list(b.edges_propagate), list(b.norms),
            masks=list(b.masks), train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
    )(variables, batch)
    variables = {"params": variables["params"],
                 "batch_stats": upd["batch_stats"]}

    _, apply_fe = build(True)

    fwd_ref = jax.jit(lambda v, b: apply_ref(v, b)).lower(
        variables, batch).compile()
    n_before = len(calls)
    assert n_before == 0, "standard path must not touch the kernel"

    fwd_fe = jax.jit(lambda v, b: apply_fe(v, b)).lower(
        variables, batch).compile()
    n_fused = len(calls)
    print(f"fused_layer_eval activations at flagship: {n_fused}")
    for shp in calls:
        print(f"  table={shp[0]} nei={shp[1]} window={shp[2]}")
    if n_fused == 0:
        print("GATE NEVER FIRED — fused_eval silently no-ops. FAIL")
        sys.exit(1)

    out_ref = np.asarray(fwd_ref(variables, batch), np.float32)
    out_fe = np.asarray(fwd_fe(variables, batch), np.float32)
    m = np.asarray(batch.masks[0])
    err = np.abs(out_ref[m] - out_fe[m]).max()
    scale = max(np.abs(out_ref[m]).max(), 1.0)
    print(f"parity: max abs err {err:.4e} (scale {scale:.3f}, "
          f"rel {err / scale:.4e})")

    ov = readback_overhead()
    valid = int(batch.masks[0].sum())
    t_ref = time_fn(fwd_ref, variables, batch, iters=10, overhead=ov,
                    reps=args.eval_repeats)
    t_fe = time_fn(fwd_fe, variables, batch, iters=10, overhead=ov,
                   reps=args.eval_repeats)
    print(f"XLA windowed : {t_ref * 1e3:7.2f} ms  "
          f"{valid / t_ref / 1e6:6.3f} Mpts/s")
    print(f"fused_eval   : {t_fe * 1e3:7.2f} ms  "
          f"{valid / t_fe / 1e6:6.3f} Mpts/s  "
          f"({t_ref / t_fe:.3f}x)")
    rel = err / scale
    tol = 0.05 if args.dtype == "bfloat16" else 5e-3
    if rel > tol:
        print(f"PARITY FAIL (rel {rel:.3e} > {tol})")
        sys.exit(1)
    print("probe OK")


if __name__ == "__main__":
    main()
