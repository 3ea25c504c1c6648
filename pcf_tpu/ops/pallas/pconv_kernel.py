"""Pallas fused PConv/PCF + Linear kernels.

TPU-native equivalent of the reference's fused CUDA/CUTLASS paths
(pcf_cuda.pconv_linear_cutlass_forward, pconv_ops.cu:950-1269, and
pcf_forward, pcf_ops.cu:26-71): guidance modulation, the K-neighbor
contraction, and the output linear run in ONE kernel so the fat
[M, C*W]-wide pconv intermediate lives only in VMEM — on TPU that
intermediate (e.g. 81920 x 1024 f32 = 335MB per direction) is pure HBM
traffic the XLA path pays twice.

The kernels consume pre-gathered neighbor features (the gather itself stays
in XLA, which pipelines it with neighboring ops; in-kernel gathers of K
random rows per point would serialize thousands of tiny DMAs).

Per grid step (tile of Mt points):
  gathered [Mt, K, C]  (guidance [Mt, K, H])  weights [Mt, K, W]
  linear_w [C*W, O] + linear_b [1, O] (broadcast)  ->  out [Mt, O]

The contraction einsum('mkc,mkw->mcw') runs as a batched MXU matmul; the
linear is one [Mt, C*W] x [C*W, O] MXU matmul on the VMEM-resident
intermediate.

Autodiff: custom_vjp whose backward is the XLA reference path (the gather
transpose is XLA's scatter-add — the reference needed a hand-built
inverse-kNN CSR for this, knn.cu; XLA derives it). Mirrors the reference's
fused-forward/derived-backward split (layer_utils.py:42-70).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pcf_tpu.ops.gather import index_points
from pcf_tpu.ops.pconv import guided_contraction, pconv


def _contract_and_project(g, v, lw3, lb, mm_dtype=jnp.float32):
    """K-contraction as a VPU multiply-reduce, projection as W fat MXU
    matmuls accumulated in VMEM.

    out[m,o] = sum_w (sum_k v[m,k,w] * g[m,k,:]) @ lw3[w]  with lw3 the
    linear weight pre-arranged [W, C, O] (c-major vec(A^T W) @ L of the
    reference). The obvious batched dot_general ([C,K]x[K,W] per point)
    feeds the 128x128 MXU with K=16-deep matmuls at ~1.5% utilization —
    measured 36% slower at the model level than this formulation, the
    in-kernel mirror of the XLA path's r5 contraction rewrite
    (benchmarks/RESULTS.md). Mosaic supports neither multi-dim contractions
    nor lane-merging reshapes, hence the static W-loop.

    mm_dtype sets the MXU multiplicand dtype (f32 accumulate either way).
    When the model runs bf16 activations the XLA path's matmuls are
    bf16xbf16 (DEFAULT precision); an f32xf32 dot here would lower to
    multi-pass MXU emulation — slower AND a different numeric contract
    than the path it replaces. The VPU K-reduce stays f32 (native).
    """
    W = v.shape[-1]
    acc = jnp.broadcast_to(lb, (g.shape[0], lb.shape[-1])).astype(jnp.float32)
    for w in range(W):
        # [Mt,K,1] lane-broadcast * [Mt,K,C], K-reduce on sublanes -> [Mt,C]
        pc_w = jnp.sum(g * v[:, :, w:w + 1], axis=1)
        acc = acc + jnp.dot(pc_w.astype(mm_dtype), lw3[w].astype(mm_dtype),
                            preferred_element_type=jnp.float32)
    return acc


def _mm_dtype_of(*operands):
    """bf16 multiplicands iff every traced operand is bf16 (the model's
    compute_dtype contract); anything f32 keeps full-precision matmuls."""
    return (jnp.bfloat16 if all(o.dtype == jnp.bfloat16 for o in operands)
            else jnp.float32)


def _pconv_kernel(g_ref, v_ref, lw_ref, lb_ref, out_ref):
    g = g_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    out = _contract_and_project(g, v, lw_ref[...].astype(jnp.float32),
                                lb_ref[...].astype(jnp.float32),
                                mm_dtype=_mm_dtype_of(g_ref, v_ref))
    out_ref[...] = out.astype(out_ref.dtype)


def _make_pcf_kernel(n_repeat: int, interpret: bool):
    def kernel(g_ref, guid_ref, v_ref, lw_ref, lb_ref, out_ref):
        g = g_ref[...].astype(jnp.float32)
        guid = guid_ref[...].astype(jnp.float32)
        v = v_ref[...].astype(jnp.float32)
        # channel c modulated by head c % H (pcf_ops.cu:58-68): lane-tile
        # C//H copies of guid so lane c holds guid[..., c % H]. pltpu.repeat
        # is one Mosaic op; an n-way jnp.concatenate materialized n
        # lane-padded [tile, K, H->128] copies and blew the 16MB VMEM scope
        # on chip (H=4 -> 12 copies).
        if guid.shape[-1] == 1:
            guid_full = guid  # H=1 (PCF_Tiny): plain lane broadcast
        elif n_repeat > 1:
            if interpret:
                guid_full = jnp.concatenate([guid] * n_repeat, axis=-1)
            else:
                guid_full = pltpu.repeat(guid, n_repeat, axis=2)
        else:
            guid_full = guid
        out = _contract_and_project(g * guid_full, v,
                                    lw_ref[...].astype(jnp.float32),
                                    lb_ref[...].astype(jnp.float32),
                                    mm_dtype=_mm_dtype_of(g_ref, v_ref))
        out_ref[...] = out.astype(out_ref.dtype)

    return kernel


def _tile_m_for(K, C, H, W, O, budget_bytes=12 * 2 ** 20):
    """Points per grid step sized to the 16MB VMEM scope (v5e).

    Mosaic lays a [tile, K, X] block out with X padded to full 128-lane
    registers, so the guidance (H<=8) and weights (W=16) windows each cost
    K*128 lanes per point, the gathered [K, C] window K*ceil(C/128)*128,
    and the guidance broadcast + modulated product another ~2 K*cp — inputs
    double-buffered by the pipeline. A fixed tile of 128 OOMs scoped vmem
    at K>=32 (seen on chip: 21MB > 16MB limit)."""
    lane = 128
    cp = -(-C // lane) * lane
    per_point = 2 * K * (cp + lane + (lane if H else 0)) + 2 * K * cp * (1 if H else 0)
    per_point = 4 * (per_point + W * cp + O)
    if H > 1:
        # Mosaic's stack allocation grows with the lane-repeat factor C//H
        # (measured: C=48/H=4 at tile 128 hit 16.49MB where C=64/H=8 fit)
        budget_bytes = int(budget_bytes * min(1.0, 8.0 / max(C // H, 8)))
    tile = int(budget_bytes // max(per_point, 1))
    # power-of-two tiles are ~2x faster than odd multiples of 8 on the MXU
    # (measured on v5e: tile 64 -> 3.35ms vs tile 56 -> 6.55ms at K=32)
    pow2 = 1 << (max(tile, 8).bit_length() - 1)
    return int(max(8, min(128, pow2)))


def _run_fused(gathered, guidance, weights, linear_w, linear_b, *,
               interpret=False):
    M, K, C = gathered.shape
    W = weights.shape[-1]
    O = linear_w.shape[-1]
    H = guidance.shape[-1] if guidance is not None else 0
    tile_m = min(_tile_m_for(K, C, H, W, O), max(8, M))
    Mp = -(-M // tile_m) * tile_m
    if Mp != M:
        pad = [(0, Mp - M), (0, 0), (0, 0)]
        gathered = jnp.pad(gathered, pad)
        weights = jnp.pad(weights, pad)
        if guidance is not None:
            guidance = jnp.pad(guidance, pad)
    lb2 = linear_b.reshape(1, O)

    grid = (Mp // tile_m,)
    in_specs = [pl.BlockSpec((tile_m, K, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)]
    operands = [gathered]
    if guidance is not None:
        in_specs.append(pl.BlockSpec((tile_m, K, H), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(guidance)
    in_specs += [
        pl.BlockSpec((tile_m, K, W), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((W, C, O), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [weights, linear_w.reshape(C, W, O).transpose(1, 0, 2), lb2]

    kernel = (_make_pcf_kernel(C // H, interpret) if guidance is not None
              else _pconv_kernel)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_m, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, O), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * Mp * K * C * W + 2 * Mp * C * W * O,
            bytes_accessed=Mp * K * (C + W) * 4 + Mp * O * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)
    return out[:M]


def _ref_pcf(feats, nei_inds, guidance, weights, linear_w, linear_b,
             precision=lax.Precision.HIGHEST):
    gathered = index_points(feats, nei_inds)
    if guidance is not None:
        gathered = guided_contraction(gathered, guidance)
    out = pconv(gathered, weights, precision=precision)
    return jnp.matmul(out, linear_w, precision=precision) + linear_b


def _ref_pconv_pe(feats, nei_inds, add, weights, linear_w, linear_b,
                  precision=lax.Precision.HIGHEST):
    gathered = jnp.concatenate([index_points(feats, nei_inds), add], axis=-1)
    out = pconv(gathered, weights, precision=precision)
    return jnp.matmul(out, linear_w, precision=precision) + linear_b


# --- PCF variant: gather + guidance + contraction + linear ----------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _pcf_linear(feats, nei_inds, guidance, weights, linear_w, linear_b,
                interpret=False):
    gathered = index_points(feats, nei_inds)
    return _run_fused(gathered, guidance, weights, linear_w, linear_b,
                      interpret=interpret)


def _pcf_linear_fwd(feats, nei_inds, guidance, weights, linear_w, linear_b,
                    interpret=False):
    out = _pcf_linear(feats, nei_inds, guidance, weights, linear_w, linear_b,
                      interpret)
    return out, (feats, nei_inds, guidance, weights, linear_w, linear_b)


def _pcf_linear_bwd(interpret, res, g):
    # Backward = VJP of the XLA reference at DEFAULT matmul precision: the
    # fused forward already computes bf16-multiplicand products, and HIGHEST
    # here would lower every backward matmul to 3-6 pass f32 emulation
    # (measured: the whole fused train step ran slower than unfused).
    feats, nei_inds, guidance, weights, linear_w, linear_b = res
    _, vjp = jax.vjp(
        lambda f, gd, w, lw, lb: _ref_pcf(
            f, nei_inds, gd, w, lw, lb, precision=None),
        feats, guidance, weights, linear_w, linear_b)
    d_feats, d_guid, d_w, d_lw, d_lb = vjp(g)
    return d_feats, None, d_guid, d_w, d_lw, d_lb


_pcf_linear.defvjp(_pcf_linear_fwd, _pcf_linear_bwd)


# --- PConv variant: gather + PE concat + contraction + linear -------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def _pconv_pe_linear(feats, nei_inds, add, weights, linear_w, linear_b,
                     interpret=False):
    gathered = jnp.concatenate([index_points(feats, nei_inds), add], axis=-1)
    return _run_fused(gathered, None, weights, linear_w, linear_b,
                      interpret=interpret)


def _pconv_pe_linear_fwd(feats, nei_inds, add, weights, linear_w, linear_b,
                         interpret=False):
    out = _pconv_pe_linear(feats, nei_inds, add, weights, linear_w, linear_b,
                           interpret)
    return out, (feats, nei_inds, add, weights, linear_w, linear_b)


def _pconv_pe_linear_bwd(interpret, res, g):
    feats, nei_inds, add, weights, linear_w, linear_b = res
    _, vjp = jax.vjp(
        lambda f, a, w, lw, lb: _ref_pconv_pe(
            f, nei_inds, a, w, lw, lb, precision=None),
        feats, add, weights, linear_w, linear_b)
    d_feats, d_add, d_w, d_lw, d_lb = vjp(g)
    return d_feats, None, d_add, d_w, d_lw, d_lb


_pconv_pe_linear.defvjp(_pconv_pe_linear_fwd, _pconv_pe_linear_bwd)


# --- windowed variants: in-kernel gather resolve ---------------------------
#
# The round-1 design left the two big optimizations mutually exclusive: the
# windowed dedup gather (ops/window.py) resolved edges in its OWN kernel,
# materializing [M, K, C] to HBM, which the separate fused conv+linear kernel
# then re-read (or, worse, the fused path unwrapped to plain edges and paid
# the full M*K-row gather). Here the window resolve happens INSIDE the
# contraction kernel: XLA gathers only the T*Wsz deduplicated window rows
# (~2.7x fewer HBM row transactions than M*K at the flagship geometry), the
# kernel one-hot-resolves the edges from the VMEM-resident window and
# contracts in place — the TPU answer to the reference CUDA kernel's
# in-kernel per-thread gather (pconv_ops.cu:621-646,950-1269), where the
# gathered neighborhood exists only in scratch memory.

def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def _make_windowed_kernel(K: int, n_repeat: int, has_guid: bool, P: int,
                          interpret: bool):
    """Blocks per grid step (G window tiles of Mt points each):
      win [G, Wsz, C]   XLA-gathered dedup window rows (the only feature
                        HBM traffic), loc [G, 1, Mt*K] window positions,
      guid [G*Mt, K, H] | add [G*Mt, K, P] (optional), v [G*Mt, K, W],
      lw [W, C+P, O], lb [1, O] -> out [G*Mt, O];
    plus a [G, Mt*K, C] f32 VMEM scratch holding the resolved gather."""

    def kernel(win_ref, loc_ref, *rest):
        if has_guid:
            extra_ref, v_ref, lw_ref, lb_ref, out_ref, gath_ref = rest
        elif P:
            extra_ref, v_ref, lw_ref, lb_ref, out_ref, gath_ref = rest
        else:
            v_ref, lw_ref, lb_ref, out_ref, gath_ref = rest
            extra_ref = None
        G, Wsz, C = win_ref.shape
        MtK = loc_ref.shape[-1]
        Mt = MtK // K
        # chunk the edge dim so the [Wsz, chunk] one-hot stays ~1MB (see
        # window.py _fwd_kernel for the lane-major layout rationale)
        chunk = min(MtK, max(128, (2 ** 19 // max(Wsz, 1)) // 128 * 128))
        while MtK % chunk:
            chunk -= 128
        n_chunks = MtK // chunk
        iota = lax.broadcasted_iota(jnp.int32, (Wsz, chunk), 0)

        def resolve(i, _):
            g = i // n_chunks
            e = (i % n_chunks) * chunk
            win = win_ref[g]                            # [Wsz, C]
            lc = loc_ref[g, :, pl.dslice(e, chunk)]     # [1, chunk]
            onehot = (iota == lc).astype(win.dtype)     # [Wsz, chunk]
            gath_ref[g, pl.dslice(e, chunk)] = lax.dot_general(
                onehot, win, (((0,), (0,)), ((), ())),  # one-hot^T @ win
                preferred_element_type=jnp.float32).astype(gath_ref.dtype)
            return ()

        lax.fori_loop(0, G * n_chunks, resolve, ())

        lw = lw_ref[...].astype(jnp.float32)
        lb = lb_ref[...].astype(jnp.float32)
        mm = _mm_dtype_of(win_ref, v_ref)

        def tile(g, _):
            rows = pl.dslice(g * Mt, Mt)
            # sublane-dim split (lanes untouched): layout-preserving
            gath = gath_ref[g].reshape(Mt, K, C).astype(jnp.float32)
            v = v_ref[rows].astype(jnp.float32)
            if has_guid:
                guid = extra_ref[rows].astype(jnp.float32)
                if guid.shape[-1] == 1 or n_repeat <= 1:
                    gf = guid
                elif interpret:
                    gf = jnp.concatenate([guid] * n_repeat, axis=-1)
                else:
                    gf = pltpu.repeat(guid, n_repeat, axis=2)
                gath = gath * gf
            elif P:
                gath = jnp.concatenate(
                    [gath, extra_ref[rows].astype(jnp.float32)], axis=-1)
            out_ref[rows] = _contract_and_project(
                gath, v, lw, lb, mm_dtype=mm).astype(out_ref.dtype)
            return ()

        lax.fori_loop(0, G, tile, ())

    return kernel


def _run_fused_windowed(windows, localT, guidance, add, weights, linear_w,
                        linear_b, K, interpret):
    T, Wsz, C = windows.shape
    MtK = localT.shape[-1]
    Mt = MtK // K
    M = T * Mt
    W = weights.shape[-1]
    O = linear_w.shape[-1]
    H = guidance.shape[-1] if guidance is not None else 0
    P = add.shape[-1] if add is not None else 0
    Ct = C + P
    isz = windows.dtype.itemsize
    cp = _pad128(C)
    # per-window-tile VMEM: double-buffered win/loc/guid-or-add/v blocks,
    # the f32 resolve scratch, and ~3 tile-working copies in the body
    per_tile = (2 * Wsz * cp * isz + 2 * MtK * 4
                + 2 * Mt * K * 128 * isz * (2 if (H or P) else 1)
                + MtK * cp * isz + 3 * Mt * K * _pad128(Ct) * 4)
    budget = 10 * 2 ** 20 - 4 * (W * _pad128(Ct) * O + Wsz * 1024)
    G = min(8, max(1, budget // max(per_tile, 1)))
    while T % G:
        G -= 1

    grid = (T // G,)
    in_specs = [
        pl.BlockSpec((G, Wsz, C), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, 1, MtK), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [windows, localT]
    if guidance is not None:
        in_specs.append(pl.BlockSpec((G * Mt, K, H), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(guidance)
    elif P:
        in_specs.append(pl.BlockSpec((G * Mt, K, P), lambda i: (i, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(add)
    in_specs += [
        pl.BlockSpec((G * Mt, K, W), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((W, Ct, O), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, O), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands += [weights, linear_w.reshape(Ct, W, O).transpose(1, 0, 2),
                 linear_b.reshape(1, O)]

    kernel = _make_windowed_kernel(K, (C // H) if H else 1,
                                   guidance is not None, P, interpret)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G * Mt, O), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, O), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, MtK, C), windows.dtype)],
        cost_estimate=pl.CostEstimate(
            flops=2 * T * MtK * Wsz * C + 2 * M * K * Ct * W
            + 2 * M * Ct * W * O,
            bytes_accessed=T * Wsz * C * isz + M * K * (W + H + P) * isz
            + M * O * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def windowed_fusable(edges, K: int | None = None) -> bool:
    """Can the fused kernel resolve these WindowedEdges in VMEM? Needs the
    in-kernel [Mt*K, C] -> [Mt, K, C] sublane split 8-aligned and the edge
    dim 128-chunkable (both hold for the production tile=128, K=16)."""
    from pcf_tpu.ops.window import WindowedEdges

    if not isinstance(edges, WindowedEdges):
        return False
    K = edges.nei.shape[1] if K is None else K
    MtK = edges.localT.shape[-1]
    return K % 8 == 0 and MtK % 128 == 0


def _ref_pcf_win(mk, interpret, feats, window_rows, localT, guidance,
                 weights, linear_w, linear_b):
    from pcf_tpu.ops.window import _windowed_take, resolve_impl

    gathered = _windowed_take(mk, interpret, resolve_impl(), feats,
                              window_rows, localT)
    gathered = guided_contraction(gathered, guidance)
    out = pconv(gathered, weights, precision=None)
    return jnp.matmul(out, linear_w) + linear_b


def _ref_pconv_pe_win(mk, interpret, feats, window_rows, localT, add,
                      weights, linear_w, linear_b):
    from pcf_tpu.ops.window import _windowed_take, resolve_impl

    gathered = _windowed_take(mk, interpret, resolve_impl(), feats,
                              window_rows, localT)
    gathered = jnp.concatenate([gathered, add], axis=-1)
    out = pconv(gathered, weights, precision=None)
    return jnp.matmul(out, linear_w) + linear_b


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _pcf_linear_win(mk, interpret, feats, window_rows, localT, guidance,
                    weights, linear_w, linear_b):
    windows = jnp.take(feats, window_rows, axis=0, mode="clip")  # [T, Wsz, C]
    return _run_fused_windowed(windows, localT, guidance, None, weights,
                               linear_w, linear_b, mk[1], interpret)


def _pcf_linear_win_fwd(mk, interpret, feats, window_rows, localT, guidance,
                        weights, linear_w, linear_b):
    out = _pcf_linear_win(mk, interpret, feats, window_rows, localT, guidance,
                          weights, linear_w, linear_b)
    return out, (feats, window_rows, localT, guidance, weights, linear_w,
                 linear_b)


def _pcf_linear_win_bwd(mk, interpret, res, g):
    # backward = VJP of the windowed XLA reference path: the window-resolve
    # transpose (window.py _bwd_kernel) + the T*Wsz-row scatter — the same
    # measured-3x-cheaper training scatter the standalone windowed path uses
    feats, window_rows, localT, guidance, weights, linear_w, linear_b = res
    _, vjp = jax.vjp(
        lambda f, gd, w, lw, lb: _ref_pcf_win(
            mk, interpret, f, window_rows, localT, gd, w, lw, lb),
        feats, guidance, weights, linear_w, linear_b)
    d_feats, d_guid, d_w, d_lw, d_lb = vjp(g)
    return d_feats, None, None, d_guid, d_w, d_lw, d_lb


_pcf_linear_win.defvjp(_pcf_linear_win_fwd, _pcf_linear_win_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _pconv_pe_linear_win(mk, interpret, feats, window_rows, localT, add,
                         weights, linear_w, linear_b):
    windows = jnp.take(feats, window_rows, axis=0, mode="clip")
    return _run_fused_windowed(windows, localT, None,
                               add if add.shape[-1] else None, weights,
                               linear_w, linear_b, mk[1], interpret)


def _pconv_pe_linear_win_fwd(mk, interpret, feats, window_rows, localT, add,
                             weights, linear_w, linear_b):
    out = _pconv_pe_linear_win(mk, interpret, feats, window_rows, localT, add,
                               weights, linear_w, linear_b)
    return out, (feats, window_rows, localT, add, weights, linear_w, linear_b)


def _pconv_pe_linear_win_bwd(mk, interpret, res, g):
    feats, window_rows, localT, add, weights, linear_w, linear_b = res
    _, vjp = jax.vjp(
        lambda f, a, w, lw, lb: _ref_pconv_pe_win(
            mk, interpret, f, window_rows, localT, a, w, lw, lb),
        feats, add, weights, linear_w, linear_b)
    d_feats, d_add, d_w, d_lw, d_lb = vjp(g)
    return d_feats, None, None, d_add, d_w, d_lw, d_lb


_pconv_pe_linear_win.defvjp(_pconv_pe_linear_win_fwd, _pconv_pe_linear_win_bwd)


# --- public API ------------------------------------------------------------

def pcf_linear_fused(feats, nei_inds, guidance, weights, linear_w, linear_b,
                     interpret=False):
    """Fused gather + guidance + K-contraction + linear (PCF layer core).
    Replaces pcf_cuda.pcf_forward + linear (pcf_ops.cu:26-71, layers.py:392-393).

    `nei_inds` may be a WindowedEdges: the gather then touches only the
    deduplicated window rows and resolves in-kernel (see the windowed
    section above) — the composition of round 1's two exclusive wins."""
    if windowed_fusable(nei_inds):
        M, K = nei_inds.nei.shape
        return _pcf_linear_win((M, K), interpret, feats,
                               nei_inds.window_rows, nei_inds.localT,
                               guidance, weights, linear_w, linear_b)
    from pcf_tpu.ops.window import plain_edges

    return _pcf_linear(feats, plain_edges(nei_inds), guidance, weights,
                       linear_w, linear_b, interpret)


def pconv_linear_fused(feats, nei_inds, weights, linear_w, linear_b,
                       additional_features=None, interpret=False):
    """Fused gather (+ PE concat) + K-contraction + linear (PointConv core).
    Replaces pcf_cuda.pconv_linear_cutlass_forward (pconv_ops.cu:950-1269).
    WindowedEdges `nei_inds` run the in-kernel window resolve."""
    if windowed_fusable(nei_inds):
        M, K = nei_inds.nei.shape
        if additional_features is None:
            additional_features = jnp.zeros((M, K, 0), feats.dtype)
        return _pconv_pe_linear_win((M, K), interpret, feats,
                                    nei_inds.window_rows, nei_inds.localT,
                                    additional_features, weights, linear_w,
                                    linear_b)
    from pcf_tpu.ops.window import plain_edges

    nei_inds = plain_edges(nei_inds)
    if additional_features is None:
        # zero-width PE, like the reference's [B,N,K,0] placeholder
        # (layer_utils.py:82-84)
        additional_features = jnp.zeros(
            (nei_inds.shape[0], nei_inds.shape[1], 0), feats.dtype)
    return _pconv_pe_linear(feats, nei_inds, additional_features, weights,
                            linear_w, linear_b, interpret)
