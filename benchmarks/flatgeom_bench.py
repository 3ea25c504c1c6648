"""Flat-lane per-edge geometry chain vs the 3-D chain (eval lever, r4).

The r3 layout study killed naive flat-lane layouts (layout_bench variant B
lost 2.4x: every XLA reshape between a 3-D producer and a flat consumer is
a materialized relayout). This bench tests the surviving formulation: keep
the WHOLE per-edge geometry chain flat —

  localized [M, K*3] (k-major lanes) -> vi_transform_flat [M, K*12]
  -> WeightNet MLP as one block-diagonal (kron) matmul chain [M, K*W]
  -> ONE unfold to [M, K, W] at the contraction boundary

— so the only relayout is the final unfold, while every materialized
geometry intermediate pads 1.3-2.7x instead of 8-42x. Chain A mirrors the
model's current 3-D path (localized/VI materialized at the stage boundary,
exactly like nn/layers.py hoisting). Outputs are asserted equal before
timing.

Usage: python benchmarks/flatgeom_bench.py [--m 40960] [--c 16] [--o 64]
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
    ap.add_argument("--c", type=int, default=16, help="gathered feature width")
    ap.add_argument("--o", type=int, default=64, help="output linear width")
    ap.add_argument("--hid", type=int, default=16, help="weightnet hidden")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pcf_tpu.ops.vi_transform import VI_coordinate_transform, vi_transform_flat
    from pcf_tpu.utils.timing import readback_overhead, time_fn

    M, K, W, C, O, H = args.m, args.k, args.w, args.c, args.o, args.hid
    rngs = jax.random.split(jax.random.PRNGKey(0), 8)
    loc = jax.random.normal(rngs[0], (M, K, 3), jnp.float32)
    gn = jax.random.normal(rngs[1], (M, K, 3), jnp.float32)
    gn = gn / jnp.linalg.norm(gn, axis=-1, keepdims=True)
    cn = jax.random.normal(rngs[2], (M, 3), jnp.float32)
    cn = cn / jnp.linalg.norm(cn, axis=-1, keepdims=True)
    gathered = jax.random.normal(rngs[3], (M, K, C), jnp.bfloat16)
    w1 = jax.random.normal(rngs[4], (12, H), jnp.bfloat16) * 0.3
    b1 = jax.random.normal(rngs[5], (H,), jnp.bfloat16) * 0.1
    w2 = jax.random.normal(rngs[6], (H, W), jnp.bfloat16) * 0.3
    b2 = jnp.zeros((W,), jnp.bfloat16)
    lw = jax.random.normal(rngs[7], (C * W, O), jnp.bfloat16) * 0.1

    kron1 = jnp.asarray(jax.numpy.kron(jnp.eye(K, dtype=jnp.float32),
                                       w1.astype(jnp.float32)), jnp.bfloat16)
    kb1 = jnp.tile(b1, K)
    kron2 = jnp.asarray(jax.numpy.kron(jnp.eye(K, dtype=jnp.float32),
                                       w2.astype(jnp.float32)), jnp.bfloat16)
    kb2 = jnp.tile(b2, K)

    barrier = jax.lax.optimization_barrier

    def contract(g, v):
        # pconv production path: broadcast multiply + K-reduce (VPU) + linear
        prod = g[:, :, :, None] * v[:, :, None, :]
        pc = prod.astype(jnp.float32).sum(axis=1).reshape(M, C * W)
        return pc.astype(jnp.bfloat16) @ lw

    def chain_3d(loc, gn, cn, g):
        # stage boundary: localized + VI materialize (model hoists them)
        loc, gn = barrier((loc, gn))
        vi = VI_coordinate_transform(loc, gn, cn)
        vi = barrier(vi.astype(jnp.bfloat16))
        h = jax.nn.relu(vi @ w1 + b1)
        v = jax.nn.relu(h @ w2 + b2)
        return contract(g, v)

    def chain_flat(locf, gnf, cn, g):
        locf, gnf = barrier((locf, gnf))
        vi = vi_transform_flat(locf, gnf, cn)
        vi = barrier(vi.astype(jnp.bfloat16))
        h = jax.nn.relu(vi @ kron1 + kb1)
        v = jax.nn.relu(h @ kron2 + kb2)          # [M, K*W]
        return contract(g, v.reshape(M, K, W))

    locf = loc.reshape(M, K * 3)
    gnf = gn.reshape(M, K * 3)

    a = jax.jit(chain_3d)(loc, gn, cn, gathered)
    d = jax.jit(chain_flat)(locf, gnf, cn, gathered)
    import numpy as np
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - d.astype(jnp.float32))))
    scale = float(jnp.max(jnp.abs(a.astype(jnp.float32)))) or 1.0
    print(f"parity: max abs err {err:.3e} (rel {err/scale:.3e})")
    assert err / scale < 2e-2, "flat chain diverges from 3-D chain"

    ov = readback_overhead()
    rows = {}
    for name, fn, xs in [
        ("A_3d", chain_3d, (loc, gn, cn, gathered)),
        ("D_flat", chain_flat, (locf, gnf, cn, gathered)),
    ]:
        f = jax.jit(fn)
        dt = time_fn(f, *xs, iters=args.iters, overhead=ov)
        rows[name] = round(dt * 1e3, 3)
        print(f"{name:>8}: {dt*1e3:7.3f} ms")
    print(json.dumps({"m": M, "k": K, "w": W, "c": C, "ms": rows}))


if __name__ == "__main__":
    main()
