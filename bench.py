"""Benchmark: PCF_Normal-scale segmentation inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload: the flagship PointConvFormer_Segmentation (PCF_Normal capacity
grid: 5 levels, heads 8, resblocks [0,2,4,6,6], mid_dim 16 —
model_architecture.py:298-318) eval forward on a packed batch of synthetic
indoor-like scenes at 10cm-scale density; metric is valid points/sec.

The configuration benched here (XLA contraction path, default MXU
precision, compute_dtype=bfloat16) is the MEASURED-best production config —
see benchmarks/RESULTS.md for the fused-vs-XLA sweep, the scan-vs-unroll and
dtype ablations, and experiments/synth_demo/EVAL.md for the accuracy
evidence behind bf16 (trained-model mIoU identical to f32 to 4 decimals,
99.99% per-point argmax agreement).

PRIMARY metric: absolute throughput (points/sec) and latency (ms for the
packed batch) on one chip — these stand on their own.

vs_baseline: ratio against REF_A100_PTS_PER_SEC, a DERIVED estimate of the
PyTorch reference's A100 eval throughput (the repo publishes no number,
BASELINE.md). Derivation: tools/baseline_model.py counts the reference
forward's actual matmul FLOPs (31.5 GFLOP @ 30k pts), gather/param bytes,
and dispatched op count (4526) on the 10cm flagship config, then applies an
A100 roofline (19.5 TF fp32 x 0.5 eff, 1555 GB/s x 0.7 eff) plus eager-mode
per-op overhead (7.5us/op -> 34ms dispatch, the dominant term). Estimate:
0.73M pts/s; speed-of-light bound 8.4M; sensitivity ~2x over per-op overhead
in [4us, 15us] (round 1's provisional 0.42M sits inside the band). See
BASELINE.md "Derived baseline".
"""

import json
import time

REF_A100_PTS_PER_SEC = 0.73e6  # derived; see tools/baseline_model.py


def _relay_reachable(timeout_s: float = 5.0) -> bool:
    """The axon TPU relay wedges hard when its listener is gone: the first
    backend touch blocks FOREVER in PJRT client init (observed 2026-08-17,
    multi-hour outage). Probe the relay port first so an outage produces a
    diagnostic JSON line instead of a hung benchmark."""
    import os
    import socket

    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return True  # not relayed (real TPU VM or CPU run): nothing to probe
    s = socket.socket()
    s.settimeout(timeout_s)
    try:
        s.connect(("127.0.0.1", 8083))
        return True
    except OSError:
        return False
    finally:
        s.close()


def main():
    if not _relay_reachable():
        print(json.dumps({
            "metric": "eval_points_per_sec", "value": 0, "unit": "points/sec",
            "vs_baseline": 0,
            "error": "TPU relay unreachable (127.0.0.1:8083 refused) — "
                     "jax.devices() would hang; see RESULTS.md round-2 note",
        }))
        return

    import jax

    # persistent cache so repeated driver runs skip the long first compile
    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp

    from __graft_entry__ import _flagship
    from pcf_tpu.models import PointConvFormer_Segmentation

    cfg, batch = _flagship(level0_points=20000, bucket=4096, n_scenes=2,
                           window_gather=True)
    cfg.compute_dtype = "bfloat16"  # measured-best; accuracy evidence above
    cfg.window_gather = True  # windowed dedup gather (benchmarks/RESULTS.md r6)
    model = PointConvFormer_Segmentation(cfg)

    # The packed batch — geometry included — is an ARGUMENT of the timed
    # function: closing over points/edges lets XLA constant-fold the
    # geometry gathers + VI transform, overstating throughput ~1.5x
    # (29 vs 45 ms measured); production eval sees new geometry per batch.
    def apply(v, b, train, **kw):
        return model.apply(v, b.feats, list(b.points), list(b.edges_self),
                           list(b.edges_forward), list(b.edges_propagate),
                           list(b.norms), masks=list(b.masks), train=train,
                           **kw)

    vs = jax.jit(
        lambda k, b: model.init(
            k, b.feats, list(b.points), list(b.edges_self),
            list(b.edges_forward), list(b.edges_propagate), list(b.norms),
            masks=list(b.masks), train=False)
    )(jax.random.PRNGKey(0), batch)
    # calibrate BN running stats with one train-mode pass: freshly initialized
    # running stats (mean 0 / var 1) leave eval activations unnormalized and
    # overflowing — same as torch BN at init
    _, upd = jax.jit(
        lambda v, b: apply(v, b, True, mutable=["batch_stats"],
                           rngs={"dropout": jax.random.PRNGKey(1)})
    )(vs, batch)
    vs = {"params": vs["params"], "batch_stats": upd["batch_stats"]}

    from pcf_tpu.utils.timing import time_fn_stats

    fwd = jax.jit(lambda v, b: apply(v, b, False))
    # >=5 repetitions with spread: run-to-run drift through the device relay
    # is ±1.5% for byte-identical programs (RESULTS.md r3), so the headline
    # carries min/max to make round-over-round deltas interpretable.
    st = time_fn_stats(fwd, vs, batch, iters=10, reps=5)
    dt = st["median"]

    valid_points = int(batch.masks[0].sum())
    pts_per_sec = valid_points / dt
    print(json.dumps({
        "metric": "PCF_Normal 10cm eval throughput (synthetic scenes, 1 chip)",
        "value": round(pts_per_sec, 1),
        "unit": "points/sec",
        "ms_per_batch": round(dt * 1e3, 2),
        "ms_min": round(st["min"] * 1e3, 2),
        "ms_max": round(st["max"] * 1e3, 2),
        "pts_per_sec_min": round(valid_points / st["max"], 1),
        "pts_per_sec_max": round(valid_points / st["min"], 1),
        "valid_points": valid_points,
        "vs_baseline": round(pts_per_sec / REF_A100_PTS_PER_SEC, 3),
        "baseline_derivation": "tools/baseline_model.py (0.73M pts/s, ~2x band)",
    }))


if __name__ == "__main__":
    main()
