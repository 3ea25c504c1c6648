"""kNN benchmark: on-device tiled brute force vs host KD-trees.

Mirrors knn_post_benchmark.py (reference: :114-151), which timed the
dataloader + GPU-kNN enumeration without the model.

Usage: python benchmarks/knn_bench.py [--sizes 20480 81920] [--k 16]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", type=int, nargs="+",
                        default=[20480, 81920, 163840])
    parser.add_argument("--k", type=int, default=16)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from pcf_tpu import native
    from pcf_tpu.ops.knn import knn
    from pcf_tpu.utils.timing import readback_overhead, time_fn

    rng = np.random.default_rng(0)
    ov = readback_overhead()
    k = args.k
    print(f"{'N':>8} | {'device ms':>9} {'native C++ ms':>13} {'scipy ms':>9}")
    for n in args.sizes:
        pts = rng.uniform(0, 10, size=(n, 3)).astype(np.float32)
        pj = jnp.asarray(pts)
        dev = jax.jit(lambda p: knn(p, p, k))
        t_dev = time_fn(dev, pj, iters=3, overhead=ov)

        t0 = time.perf_counter()
        native.knn(pts, pts, k) if native.is_available() else None
        t_nat = time.perf_counter() - t0 if native.is_available() else float("nan")

        from scipy.spatial import cKDTree

        t0 = time.perf_counter()
        cKDTree(pts).query(pts, k=k)
        t_sci = time.perf_counter() - t0
        print(f"{n:>8} | {t_dev*1000:9.1f} {t_nat*1000:13.1f} {t_sci*1000:9.1f}",
              flush=True)


if __name__ == "__main__":
    main()
