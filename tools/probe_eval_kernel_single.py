"""Single-kernel on-chip probe for fused_layer_eval at one flagship shape.

Faster signal than the whole-model probe: compiles exactly ONE Mosaic
kernel (the L0 PointConvStridePE residual shape by default) and reports
compile wall, parity vs the plain-jnp fold math, and timing. Run stages
print unbuffered so a hang is attributable.

Usage: python -u tools/probe_eval_kernel_single.py [--case l0res|l0pcf|l1str]
"""

from __future__ import annotations

import argparse
import faulthandler
import signal
import sys
import time

sys.path.insert(0, ".")

# `kill -USR1 <pid>` dumps all thread stacks without killing the run —
# the relay makes cold compiles minutes-long and indistinguishable from hangs.
faulthandler.register(signal.SIGUSR1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--case", default="l0res",
                   choices=["l0res", "l0pcf", "l1str", "tiny"])
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/pcf_tpu_jax_cache_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    from pcf_tpu.ops.window import build_windows
    from pcf_tpu.attic.eval_kernel import fused_layer_eval
    from pcf_tpu.utils.timing import readback_overhead, time_fn

    print(f"backend: {jax.default_backend()} "
          f"({jax.devices()[0].device_kind})", flush=True)

    # flagship L0: M=N=40960 (2 scenes x 20k, bucket 4096), K=16, Wsz=512
    # residual stride_pe: Cx=16 (bottleneck), W=16, O=32 (out_channel 64 // 2)
    cases = {
        # (N, M, K, Wsz, Cx, Cg, Cs, H, W, O, guided, strided)
        "l0res": (40960, 40960, 16, 512, 16, 0, 0, 0, 16, 32, False, False),
        "l0pcf": (40960, 40960, 16, 512, 16, 8, 0, 8, 16, 32, True, False),
        "l1str": (40960, 12288, 16, 1280, 32, 16, 64, 8, 16, 64, True, True),
        "tiny": (2048, 2048, 16, 256, 16, 0, 0, 0, 16, 32, False, False),
    }
    N, M, K, Wsz, Cx, Cg, Cs, H, W, O, guided, strided = cases[args.case]
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.default_rng(0)
    base = (np.arange(M, dtype=np.int64) * N // M)[:, None]
    # offsets sized so each 128-row tile's unique neighbors fit the window
    span = (128 * N) // M
    off = max(16, (Wsz - span) // 2 - 16)
    nei = np.clip(base + rng.integers(-off, off + 1, size=(M, K)), 0,
                  N - 1).astype(np.int32)
    t0 = time.time()
    edges = build_windows(nei, tile=128, window=Wsz)
    print(f"windows built {time.time() - t0:.1f}s "
          f"T={edges.window_rows.shape[0]} Wsz={edges.window_rows.shape[1]}",
          flush=True)

    feat = jnp.asarray(rng.normal(size=(N, Cx + Cg + Cs)).astype(np.float32)
                       ).astype(dt)
    geo = jnp.asarray(
        np.concatenate([rng.uniform(0, 6, size=(N, 3)),
                        rng.normal(size=(N, 3))], 1).astype(np.float32))
    geo = geo.at[:, 3:6].set(geo[:, 3:6] / jnp.linalg.norm(
        geo[:, 3:6], axis=1, keepdims=True))
    cx = geo[:M, :3]
    cn = geo[:M, 3:6]

    def mk(ci, co):
        return (jnp.asarray(rng.normal(size=(ci, co)).astype(np.float32)) * 0.3,
                jnp.asarray(rng.normal(size=(co,)).astype(np.float32)) * 0.1)

    wn = [mk(12, 8), mk(8, W)]
    # pe_on_vi=False: the PE MLP input is the 3-wide localized xyz
    pe = [] if guided else [mk(3, 8), mk(8, 8)]
    gd = [mk(2 * (Cg + 8), 8), mk(8, H)] if guided else []
    Cpe = 0 if guided else 8
    Ct = Cx if guided else Cx + Cpe
    lw = jnp.asarray(rng.normal(size=(Ct * W, O)).astype(np.float32)) * 0.05
    lb = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))

    kw = dict(Cx=Cx, Cg=Cg, Cs=Cs, use_vi=True, pe_on_vi=guided,
              strided=strided, num_heads=H, out_dtype=dt)

    f = jax.jit(lambda ft, g, c, n: fused_layer_eval(
        ft, g, edges, c, n, wn, pe, gd, lw, lb, **kw))
    t0 = time.time()
    lowered = f.lower(feat, geo, cx, cn)
    print(f"lowered {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    out, short = compiled(feat, geo, cx, cn)
    jax.block_until_ready(out)
    print(f"first run {time.time() - t0:.2f}s out={out.shape} "
          f"finite={bool(jnp.isfinite(out.astype(jnp.float32)).all())}",
          flush=True)

    ov = readback_overhead()
    t = time_fn(lambda: compiled(feat, geo, cx, cn)[0], iters=20,
                overhead=ov)
    print(f"kernel: {t * 1e3:.3f} ms/call", flush=True)

    # XLA reference of the same math (gather form), timed for context
    from pcf_tpu.ops.vi_transform import VI_coordinate_transform

    def ref(ft, g, c, n):
        gf = jnp.take(ft, edges.nei, axis=0)            # [M,K,Cf]
        gx = jnp.take(g[:, :3], edges.nei, axis=0)
        gn = jnp.take(g[:, 3:6], edges.nei, axis=0)
        loc = gx - c[:, None, :]
        wni = VI_coordinate_transform(loc, gn, n)
        act = wni.astype(dt)
        for wgt, b in wn:
            act = jnp.maximum(
                jnp.dot(act, wgt.astype(dt),
                        preferred_element_type=jnp.float32) + b, 0.0
            ).astype(dt)
        conv = gf[..., :Cx]
        if not guided:
            pea = wni[..., 9:12].astype(dt)
            for wgt, b in pe:
                pea = jnp.maximum(
                    jnp.dot(pea, wgt.astype(dt),
                            preferred_element_type=jnp.float32) + b, 0.0
                ).astype(dt)
            conv = jnp.concatenate([conv, pea], -1)
        # c-major [M, Ct*W] — the contract fused_layer_eval expects of lw
        pc = jnp.einsum("mkc,mkw->mcw", conv.astype(dt), act,
                        preferred_element_type=jnp.float32)
        pc = pc.reshape(M, -1).astype(dt)
        o = jnp.dot(pc, lw.astype(dt),
                    preferred_element_type=jnp.float32) + lb
        return jnp.maximum(o, 0.0).astype(dt)

    if not guided:
        rf = jax.jit(ref).lower(feat, geo, cx, cn).compile()
        tr = time_fn(lambda: rf(feat, geo, cx, cn), iters=20, overhead=ov)
        print(f"xla-gather ref: {tr * 1e3:.3f} ms/call "
              f"(kernel {tr / t:.2f}x)", flush=True)
        a = np.asarray(rf(feat, geo, cx, cn), np.float32)
        b = np.asarray(out, np.float32)
        scale = max(np.abs(a).max(), 1.0)
        print(f"parity vs xla ref: max rel {np.abs(a - b).max() / scale:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
