"""Practical HBM bandwidth ceiling on this chip (VERDICT r3 #2 follow-up).

The r3 layout study put the flagship eval at ~370 GB/s of padded traffic
and called that "~45% of the v5e's HBM peak" using the 819 GB/s spec
number. Whether eval is at the wall or has 2x headroom depends on what a
*real streaming op* achieves on this part through this toolchain — spec
sheets are not SLAs. This probe measures:

  stream_f32 / stream_bf16   y = x + 1 on a large contiguous array
                             (read + write, the textbook triad-lite)
  copy_wide                  y = x for a [rows, 512] bf16 table
  copy_narrow                y = x for a [rows, 16] bf16 table — the
                             model's padded-narrow case: reports REAL-byte
                             GB/s (the array is sized by real bytes) plus a
                             derived `GBps_if_padded` field (lane pad
                             16->128) for comparison with the eval's
                             padded-traffic figures
  gather_row                 y = x[idx] random row gather at [N, 16] —
                             the transaction-bound case (per-row tile
                             reads price a whole 8x128 tile per row)

If stream_* lands near 370 GB/s, the eval IS at the practical wall and
further gains must come from traffic reduction (fewer materialized
intermediates), not "more bandwidth". If stream_* lands near 700+, the
eval has real headroom and is limited elsewhere (issue rate, latency,
serialization).

Usage: python benchmarks/hbm_peak.py [--mb 512]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512,
                    help="working-set size per array, MiB")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcf_tpu.utils.timing import readback_overhead, time_fn

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}")
    ov = readback_overhead()
    out = {}

    def bench(name, fn, *xs, moved_bytes):
        f = jax.jit(fn)
        f(*xs).block_until_ready()
        t = time_fn(f, *xs, iters=args.iters, overhead=ov)
        gbps = moved_bytes / t / 1e9
        out[name] = {"ms": t * 1e3, "GBps": gbps}
        print(f"{name:>12}: {t*1e3:7.3f} ms  {gbps:7.1f} GB/s")

    nbytes = args.mb * 2 ** 20
    key = jax.random.PRNGKey(0)

    xf = jax.random.normal(key, (nbytes // 4,), jnp.float32)
    bench("stream_f32", lambda x: x + 1.0, xf, moved_bytes=2 * nbytes)
    xb = jax.random.normal(key, (nbytes // 2,), jnp.bfloat16)
    bench("stream_bf16", lambda x: x + 1.0, xb, moved_bytes=2 * nbytes)

    rows = nbytes // (512 * 2)
    xw = jax.random.normal(key, (rows, 512), jnp.bfloat16)
    bench("copy_wide", lambda x: x + 0.0, xw, moved_bytes=2 * nbytes)

    # narrow: a [rows, 16] bf16 table. Two readings (2026-08-20 finding):
    # at the jit ENTRY boundary XLA assigns the narrow array a TRANSPOSED
    # layout {0,1} — minor dim = rows — so it tiles (8, 128) with ZERO lane
    # padding and streams near peak on REAL bytes. Padding is therefore not
    # intrinsic to narrow shapes; it appears only where XLA materializes an
    # INTERIOR temp in the default {1,0} row-major order. moved_bytes here
    # counts REAL bytes; `GBps_if_padded` shows what the same wall time
    # means under the 8x-padded accounting the r3 study used.
    nrows = nbytes // (16 * 2)  # same REAL working set as the wide case
    xn = jax.random.normal(key, (nrows, 16), jnp.bfloat16)
    bench("copy_narrow", lambda x: x + 1.0, xn, moved_bytes=2 * nbytes)
    out["copy_narrow"]["GBps_if_padded"] = (
        out["copy_narrow"]["GBps"] * 8.0)

    # random row gather at the flagship L0 edge count: 655360 rows from a
    # 40960-row [N, 16] table. Transaction-bound: each row reads one
    # (8, 128) tile = 2 KiB bf16 -> count 2 KiB per gathered row + the
    # padded write.
    N, M_K = 40960, 655360
    tab = jax.random.normal(key, (N, 16), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M_K,), 0, N, jnp.int32)
    bench("gather_row", lambda t, i: jnp.take(t, i, axis=0), tab, idx,
          moved_bytes=M_K * (8 * 128 * 2) + M_K * 128 * 2)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
