"""Kernel benchmark suite: fused Pallas vs XLA reference across sizes.

Mirrors the reference's cpp_wrappers/cpp_pcf_kernel/test_kernels.py sweeps
(point sizes 5k-400k, K=16-128; :2056,2231,2420-2459): per-size timing with
effective TFLOPS and bandwidth, on the real chip.

Usage: python benchmarks/kernel_bench.py [--sizes 20480 81920] [--ks 16]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+",
                        default=[5120, 20480, 81920, 327680])
    parser.add_argument("--ks", type=int, nargs="+", default=[16, 32, 64])
    parser.add_argument("--c", type=int, default=64)
    parser.add_argument("--heads", type=int, default=8)
    parser.add_argument("--w", type=int, default=16)
    parser.add_argument("--out", type=int, default=128)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from pcf_tpu.ops.gather import index_points
    from pcf_tpu.ops.pconv import guided_contraction, pconv
    from pcf_tpu.ops.pallas import pcf_linear_fused
    from pcf_tpu.utils.timing import readback_overhead, time_fn

    rng = np.random.default_rng(0)
    ov = readback_overhead()
    C, H, W, O = args.c, args.heads, args.w, args.out
    print(f"{'M':>8} {'K':>4} | {'XLA ms':>8} {'Pallas ms':>9} {'speedup':>7} "
          f"{'TFLOP/s':>8} {'GB/s':>7}")
    for M in args.sizes:
        for K in args.ks:
            feats = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
            nei = jnp.asarray(rng.integers(0, M, size=(M, K)).astype(np.int32))
            guid = jnp.asarray(rng.uniform(size=(M, K, H)).astype(np.float32))
            wts = jnp.asarray(rng.normal(size=(M, K, W)).astype(np.float32))
            lw = jnp.asarray(rng.normal(size=(C * W, O)).astype(np.float32) * 0.01)
            lb = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))

            xla = jax.jit(lambda f, n, g, w, l, b: jnp.matmul(
                pconv(guided_contraction(index_points(f, n), g), w), l) + b)
            fused = jax.jit(lambda *a: pcf_linear_fused(*a))

            try:
                t_x = time_fn(xla, feats, nei, guid, wts, lw, lb, iters=10, overhead=ov)
                t_p = time_fn(fused, feats, nei, guid, wts, lw, lb, iters=10, overhead=ov)
            except Exception as e:  # e.g. HBM OOM at the largest sizes
                print(f"{M:>8} {K:>4} | OOM/err: {str(e).splitlines()[0][:60]}",
                      flush=True)
                continue
            flops = 2 * M * K * C * W + 2 * M * C * W * O
            byts = M * K * (C + W + H) * 4 + M * O * 4
            best = min(t_x, t_p)
            print(f"{M:>8} {K:>4} | {t_x*1000:8.2f} {t_p*1000:9.2f} "
                  f"{t_x/t_p:7.2f} {flops/best/1e12:8.2f} {byts/best/1e9:7.0f}",
                  flush=True)


if __name__ == "__main__":
    main()
