"""Narrow-minor-dim HBM padding microbenchmark (VERDICT r2 weak #2 follow-up).

XLA:TPU tiles every HBM buffer T(8,128) on its two minor dims, so a
[M, K, 16] tensor (weightnet outputs, guidance) carries its last dim padded
16 -> 128: 8x the HBM bytes of the useful data, and a [M, K, 3]/[M*K, 6]
geometry tensor pads >21x (seen in the 2cm OOM dump and the flagship eval
HLO — benchmarks/RESULTS.md r3). This bench isolates what that padding
actually costs at flagship shapes by timing the same producer->consumer
chain in three source layouts:

  A  [M, K, W]   the model's current layout (padded 8x when materialized)
  B  [M, K*W]    flat lanes (unpadded), consumer reshapes back
  C  [M*K, W]    flat rows (still padded 8x - control for reshape cost)

Producer = a weightnet-like MLP from [.., 12] geometry; consumer = the pconv
broadcast-multiply K-reduction against a [M, K, C] gathered tensor. If A==B
within noise, XLA is fusing away the materialization and the padding is a
non-issue for eval speed; if B wins, the model should carry flat-lane
weightnet outputs.

Usage: python benchmarks/layout_bench.py [--m 40960] [--c 64]
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=40960)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--w", type=int, default=16)
    ap.add_argument("--c", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcf_tpu.utils.timing import readback_overhead, time_fn

    M, K, W, C = args.m, args.k, args.w, args.c
    key = jax.random.PRNGKey(0)
    vi = jax.random.normal(key, (M, K, 12), jnp.bfloat16)
    gathered = jax.random.normal(key, (M, K, C), jnp.bfloat16)
    w1 = jax.random.normal(key, (12, W), jnp.bfloat16)
    w2 = jax.random.normal(key, (W, W), jnp.bfloat16)

    def consume(g, v):  # pconv broadcast-multiply + K-reduce -> [M, C*W]
        pc = jnp.einsum("mkc,mkw->mcw", g.astype(jnp.float32),
                        v.astype(jnp.float32)).astype(jnp.bfloat16)
        return pc.reshape(M, C * W).sum()  # cheap sink

    def mlp(x):
        h = jax.nn.relu(x @ w1)
        return jax.nn.relu(h @ w2)

    def variant_a(vi, g):  # [M, K, W] all the way
        v = mlp(vi)
        return consume(g, v)

    def variant_b(vi, g):  # producer emits flat [M, K*W]
        v = mlp(vi).reshape(M, K * W)
        v = jax.lax.optimization_barrier(v)  # force the flat materialization
        return consume(g, v.reshape(M, K, W))

    def variant_a_mat(vi, g):  # force [M, K, W] materialization (worst case)
        v = jax.lax.optimization_barrier(mlp(vi))
        return consume(g, v)

    def variant_c(vi, g):  # flat rows [M*K, W]
        v = jax.lax.optimization_barrier(mlp(vi.reshape(M * K, 12)))
        return consume(g, v.reshape(M, K, W))

    ov = readback_overhead()
    rows = {}
    for name, fn in [("A_fused", variant_a), ("A_materialized", variant_a_mat),
                     ("B_flat_lanes", variant_b), ("C_flat_rows", variant_c)]:
        f = jax.jit(fn)
        dt = time_fn(f, vi, gathered, iters=args.iters, overhead=ov)
        rows[name] = round(dt * 1e3, 3)
        print(f"{name:>16}: {dt * 1e3:7.3f} ms")
    print(json.dumps({"m": M, "k": K, "w": W, "c": C, "ms": rows}))


if __name__ == "__main__":
    main()
