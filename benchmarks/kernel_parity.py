"""Real-chip Pallas kernel parity check (driver-runnable).

CI exercises the fused kernels only in interpreter mode on CPU
(tests/test_pallas_kernels.py); Mosaic compilation regressions on real TPU
would be invisible there. This script runs BOTH fused kernels (PCF and
PConv+PE) against the XLA reference path on the actual chip — forward and
all gradients — across a size grid, and fails loudly on divergence.

Committed output: benchmarks/PARITY_TPU.txt.
Usage: python benchmarks/kernel_parity.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

# The fused kernel feeds the MXU at default precision (bf16 multiplicands,
# f32 accumulation): relative error vs the HIGHEST-precision XLA reference is
# bounded by the bf16 mantissa, ~2^-8 = 3.9e-3. Grads add one more rounding
# through the tanh'd forward. Anything past 5e-3 means a real kernel bug.
TOL_FWD = 4e-3
TOL_GRAD = 5e-3


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    import jax.numpy as jnp
    import numpy as np

    from pcf_tpu.ops.pallas import pcf_linear_fused, pconv_linear_fused
    from pcf_tpu.ops.pallas.pconv_kernel import _ref_pcf, _ref_pconv_pe

    print(f"backend: {jax.default_backend()} ({jax.devices()[0].device_kind})")
    assert jax.default_backend() == "tpu", "run this on the real chip"
    rng = np.random.default_rng(0)
    failures = 0

    for M, K, C, H, W, O in [
        (4096, 16, 64, 8, 16, 128),
        (20480, 16, 80, 8, 16, 160),
        (8192, 32, 64, 8, 16, 128),
        (8192, 16, 35, 0, 16, 64),   # PE-concat width (C + 3/12), odd C
        (5000, 16, 48, 4, 8, 96),    # non-multiple-of-tile M
    ]:
        feats = jnp.asarray(rng.normal(size=(M, C)).astype(np.float32))
        nei = jnp.asarray(rng.integers(0, M, size=(M, K)).astype(np.int32))
        wts = jnp.asarray(rng.normal(size=(M, K, W)).astype(np.float32) * 0.3)
        lw = jnp.asarray(rng.normal(size=(C * W, O)).astype(np.float32) * 0.02)
        lb = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))

        if H:
            guid = jnp.asarray(rng.uniform(size=(M, K, H)).astype(np.float32))
            fused = jax.jit(lambda *a: pcf_linear_fused(*a))
            ref = jax.jit(lambda f, n, g, w, l, b: _ref_pcf(f, n, g, w, l, b))
            args = (feats, nei, guid, wts, lw, lb)
            name = f"PCF    M={M:<6} K={K:<3} C={C:<3} H={H} W={W} O={O}"
        else:
            fused = jax.jit(lambda f, n, w, l, b: pconv_linear_fused(f, n, w, l, b))
            ref = jax.jit(lambda f, n, w, l, b: _ref_pconv_pe(
                f, n, jnp.zeros((M, K, 0), jnp.float32), w, l, b))
            args = (feats, nei, wts, lw, lb)
            name = f"PConv  M={M:<6} K={K:<3} C={C:<3} H=- W={W} O={O}"

        out_f = np.asarray(fused(*args))
        out_r = np.asarray(ref(*args))
        scale = max(np.abs(out_r).max(), 1.0)
        err_f = np.abs(out_f - out_r).max() / scale

        loss_fused = jax.jit(jax.grad(
            lambda *a: jnp.sum(jnp.tanh(fused(*a))),
            argnums=tuple(i for i in range(len(args)) if i != 1)))
        loss_ref = jax.jit(jax.grad(
            lambda *a: jnp.sum(jnp.tanh(ref(*a))),
            argnums=tuple(i for i in range(len(args)) if i != 1)))
        gf = loss_fused(*args)
        gr = loss_ref(*args)
        err_g = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()
                  / max(np.abs(np.asarray(b)).max(), 1.0))
            for a, b in zip(gf, gr))

        ok = err_f < TOL_FWD and err_g < TOL_GRAD
        failures += not ok
        print(f"{name} | fwd rel-err {err_f:.2e} grad rel-err {err_g:.2e} "
              f"{'OK' if ok else 'FAIL'}", flush=True)

    # --- windowed variants: in-kernel window resolve (WindowedEdges) ------
    from pcf_tpu.ops.window import build_windows

    for M, K, C, H, W, O, tile, window in [
        (20480, 16, 64, 8, 16, 128, 128, 512),
        (8192, 16, 80, 8, 16, 160, 128, 768),
        (20480, 16, 35, 0, 16, 64, 128, 512),   # PE-concat, odd C
    ]:
        N = M + 1500
        feats = jnp.asarray(rng.normal(size=(N, C)).astype(np.float32))
        nei_np = np.zeros((M, K), np.int32)
        for t in range(M // tile):  # tile-local structure, as Morton sort gives
            lo = int(rng.integers(0, N - window))
            nei_np[t * tile:(t + 1) * tile] = rng.integers(
                lo, lo + window, size=(tile, K))
        edges = build_windows(nei_np, tile=tile, window=window)
        nei = jnp.asarray(nei_np)
        wts = jnp.asarray(rng.normal(size=(M, K, W)).astype(np.float32) * 0.3)
        lw = jnp.asarray(rng.normal(size=(C * W, O)).astype(np.float32) * 0.02)
        lb = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))

        if H:
            guid = jnp.asarray(rng.uniform(size=(M, K, H)).astype(np.float32))
            fused = jax.jit(lambda f, g, w, l, b: pcf_linear_fused(
                f, edges, g, w, l, b))
            ref = jax.jit(lambda f, g, w, l, b: _ref_pcf(f, nei, g, w, l, b))
            args = (feats, guid, wts, lw, lb)
            name = f"PCFwin M={M:<6} K={K:<3} C={C:<3} H={H} W={W} O={O}"
        else:
            fused = jax.jit(lambda f, w, l, b: pconv_linear_fused(
                f, edges, w, l, b))
            ref = jax.jit(lambda f, w, l, b: _ref_pconv_pe(
                f, nei, jnp.zeros((M, K, 0), jnp.float32), w, l, b))
            args = (feats, wts, lw, lb)
            name = f"PCVwin M={M:<6} K={K:<3} C={C:<3} H=- W={W} O={O}"

        out_f = np.asarray(fused(*args))
        out_r = np.asarray(ref(*args))
        err_f = np.abs(out_f - out_r).max() / max(np.abs(out_r).max(), 1.0)
        gf = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(fused(*a))),
                              argnums=tuple(range(len(args)))))(*args)
        gr = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.tanh(ref(*a))),
                              argnums=tuple(range(len(args)))))(*args)
        err_g = max(
            float(np.abs(np.asarray(a) - np.asarray(b)).max()
                  / max(np.abs(np.asarray(b)).max(), 1.0))
            for a, b in zip(gf, gr))
        ok = err_f < TOL_FWD and err_g < TOL_GRAD
        failures += not ok
        print(f"{name} | fwd rel-err {err_f:.2e} grad rel-err {err_g:.2e} "
              f"{'OK' if ok else 'FAIL'}", flush=True)

    if failures:
        print(f"{failures} parity failures")
        sys.exit(1)
    print("all kernel parity checks passed on chip")


if __name__ == "__main__":
    main()
