"""Windowed dedup gather: the TPU-native answer to kNN gather bandwidth.

Every PCF layer gathers K=16 neighbor rows per point. On TPU a row gather
prices per ROW (~2 ns/row on v5e regardless of row width), so the M*K-row
gathers dominate the flagship forward (~70% of eval time measured). The
reference's CUDA kernels hide this behind the GPU's fine-grained memory
system (pconv_ops.cu gathers inside the fused kernel); a TPU needs a
different shape:

  1. The input pipeline sorts each pyramid level by Morton code, so
     consecutive points are spatial neighbors and CONSECUTIVE POINTS SHARE
     NEIGHBORS (measured: a 128-point tile of a Morton-sorted ScanNet-like
     scene touches <=416 unique neighbor rows, vs 2048 edge slots).
  2. Per tile of Mt output points, the pipeline precomputes the tile's
     UNIQUE neighbor rows (`window_rows` [T, Wsz], an arbitrary row list —
     no contiguity required) and per-edge positions into that list
     (`local` [T, Mt*K]).
  3. At run time the HBM gather touches only the T*Wsz ~= 4N window rows
     (4x fewer transactions), and a Pallas kernel resolves the edges from
     the VMEM-resident window with a one-hot MXU matmul whose cost is
     independent of the feature width (the one-hot operand fills the MXU's
     contraction dim; the narrow feature dim rides along).

The backward is the exact transpose: the kernel scatters cotangents into
window slots with the transposed one-hot matmul, and a single XLA
scatter-add over the T*Wsz window rows (again 4x fewer rows than the
naive M*K scatter) accumulates into the table.

Exactness: a one-hot matmul IS the gather — products are x*1 or x*0, so
bf16 and (multi-pass) f32 MXU arithmetic reproduce the input bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import flax.struct


# --------------------------------------------------------------------------
# Morton ordering (pipeline side)
# --------------------------------------------------------------------------

def _spread_bits(x: np.ndarray) -> np.ndarray:
    """Interleave 10-bit integers with two zero bits (uint64)."""
    x = x.astype(np.uint64) & np.uint64(0x3FF)
    x = (x | (x << np.uint64(16))) & np.uint64(0x030000FF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x0300F00F)
    x = (x | (x << np.uint64(4))) & np.uint64(0x030C30C3)
    x = (x | (x << np.uint64(2))) & np.uint64(0x09249249)
    return x


def morton_codes(points: np.ndarray, bits: int = 10) -> np.ndarray:
    """30-bit Morton (Z-order) codes of [N, 3] float coords (numpy)."""
    q = points - points.min(axis=0)
    scale = (1 << bits) - 1
    denom = float(q.max()) + 1e-9
    qi = np.minimum((q / denom * scale).astype(np.int64), scale)
    return (_spread_bits(qi[:, 0])
            | (_spread_bits(qi[:, 1]) << np.uint64(1))
            | (_spread_bits(qi[:, 2]) << np.uint64(2)))


def morton_argsort(points: np.ndarray) -> np.ndarray:
    """Permutation sorting [N, 3] coords into Z-order (stable)."""
    return np.argsort(morton_codes(points), kind="stable")


# --------------------------------------------------------------------------
# Window construction (pipeline side, numpy)
# --------------------------------------------------------------------------

@flax.struct.dataclass
class WindowedEdges:
    """A kNN edge set [M, K] plus its precomputed tile windows.

    nei:          [M, K] int32 — neighbor row indices (the plain edge array;
                  layers that only need indices keep using it directly).
    window_rows:  [T, Wsz] int32 — per tile of Mt=M/T output rows, the
                  deduplicated rows of `nei` that the tile touches, padded
                  (with repeats of slot 0) to the static window size.
    localT:       [T, 1, Mt*K] int32 — per edge, its position in the tile's
                  window, lane-major (both kernels' layout; a sublane-major
                  [Mt*K, 1] block would be lane-padded 128x by Mosaic).
    """

    nei: jnp.ndarray
    window_rows: jnp.ndarray
    localT: jnp.ndarray

    # --- plain-edge compatibility -------------------------------------
    @property
    def shape(self):
        return self.nei.shape

    @property
    def dtype(self):
        return self.nei.dtype

    def __getitem__(self, item):
        return self.nei[item]

    @property
    def tile(self) -> int:
        return self.nei.shape[0] // self.window_rows.shape[0]

    @property
    def window(self) -> int:
        return self.window_rows.shape[1]


# WindowedEdges ride through jax.export'ed calling conventions (serve/export
# writes the in_tree of each bucket signature); custom pytree nodes need an
# explicit serialization registration. The flax.struct auxdata is empty.
jax.export.register_pytree_node_serialization(
    WindowedEdges,
    serialized_name="pcf_tpu.ops.window.WindowedEdges",
    serialize_auxdata=lambda aux: b"",
    deserialize_auxdata=lambda b: (),
)


def plain_edges(edges) -> jnp.ndarray:
    """The raw [M, K] index array of either representation."""
    return edges.nei if isinstance(edges, WindowedEdges) else edges


def max_window_uniques(nei: np.ndarray, tile: int = 128) -> int:
    """Max unique-neighbor count over tiles of `tile` rows (pipeline-side
    sizing probe; rows are zero-padded to a tile multiple like packing)."""
    M, K = nei.shape
    Mp = -(-M // tile) * tile
    if Mp != M:
        nei = np.concatenate(
            [nei, np.zeros((Mp - M, K), nei.dtype)], axis=0)
    tiles = nei.reshape(Mp // tile, tile * K)
    return max(len(np.unique(t)) for t in tiles)


class WindowOverflow(ValueError):
    """A tile's unique-neighbor count exceeds the pinned window size (or the
    array's shape is incompatible with tiling). Callers that must survive
    adversarial scenes catch this and fall back to plain edges or drop the
    scene (PackedLoader window_overflow policy, data/scannet.py)."""


def build_windows(nei: np.ndarray, tile: int = 128, window: int | None = None,
                  strict: bool = True):
    """Precompute tile windows for an edge array (numpy, pipeline side).

    nei: [M, K] int32, M divisible by `tile`. Returns a WindowedEdges (jnp
    leaves). `window` defaults to 4*tile — holds with >=20% margin on
    Morton-sorted indoor scans (measured max 416 uniques at tile=128); a
    tile whose unique-neighbor count exceeds it raises (strict) or falls
    back to returning None (caller uses plain edges).

    (An inverse slot map for a gather-based backward — the window-level
    analog of the reference's inverse-kNN CSR, pconv_ops.cu:390-536 — was
    built and measured: the T*Wsz-row scatter it replaces is NOT a
    bottleneck at window scale, 3.6 vs 3.7 ms grad at L0 — so it was
    removed rather than carried as dead weight.)
    """
    M, K = nei.shape
    window = 4 * tile if window is None else window
    if M % tile != 0 or (tile * K) % 128 != 0 or window % 128 != 0:
        if strict:
            raise WindowOverflow(
                f"windowed gather needs M ({M}) divisible by tile ({tile}), "
                f"tile*K ({tile * K}) and window ({window}) divisible by 128")
        return None
    T = M // tile
    tiles = nei.reshape(T, tile * K)
    window_rows = np.zeros((T, window), np.int32)
    local = np.zeros((T, tile * K), np.int32)
    for t in range(T):
        uniq, inv = np.unique(tiles[t], return_inverse=True)
        if uniq.size > window:
            if strict:
                raise WindowOverflow(
                    f"tile {t}: {uniq.size} unique neighbor rows exceed the "
                    f"window size {window}; raise cfg.window_size or check "
                    f"that the pipeline Morton-sorts each level")
            return None
        window_rows[t, : uniq.size] = uniq
        # pad slots repeat row 0; padded slots are never referenced by local
        local[t] = inv

    return WindowedEdges(
        nei=jnp.asarray(nei.astype(np.int32)),
        window_rows=jnp.asarray(window_rows),
        localT=jnp.asarray(local[:, None, :]),
    )


# --------------------------------------------------------------------------
# Device op (Pallas kernels + custom VJP)
# --------------------------------------------------------------------------

def _interpret_default() -> bool:
    return jax.default_backend() == "cpu"


# Resolve implementation: "pallas" (the original kernels) or "xla" (a plain
# one-hot einsum). Measured on the v5e (2026-08-20, L0 scale T=320 Wsz=512
# K=16): XLA beats the Pallas kernel 3.4x at C=16 (0.53 vs 1.82 ms), 2.8x at
# C=64, 1.5x at C=128 — XLA tiles the [T] batch of [Wsz,C]x[Wsz,MtK] matmuls
# onto the MXU better than the hand-planned grid, and it also makes narrow
# f32 (geometry) windows viable (no Mosaic 128-lane VMEM padding). The
# global is read at TRACE time (set it before jitting; PCF_Backbone sets it
# from cfg.resolve_impl at the top of every trace).
_RESOLVE_IMPL = "pallas"


def set_resolve_impl(impl: str) -> None:
    global _RESOLVE_IMPL
    if impl not in ("pallas", "xla"):
        raise ValueError(f"resolve_impl must be 'pallas' or 'xla', got {impl!r}")
    _RESOLVE_IMPL = impl


def resolve_impl() -> str:
    return _RESOLVE_IMPL


def _onehot_for(localT, Wsz: int, dtype):
    """[T, 1, MtK] positions -> [T, Wsz, MtK] one-hot (fuses into the dot)."""
    lc = localT[:, 0, :]
    iota = jax.lax.broadcasted_iota(jnp.int32, (localT.shape[0], Wsz, 1), 1)
    return (lc[:, None, :] == iota).astype(dtype)


def _resolve_xla(wins, localT, out_dtype):
    """One-hot einsum resolve: [T, Wsz, C] + [T, 1, MtK] -> [T, MtK, C].

    Products are x*1/x*0 — exact selection — but only if the data operand is
    not rounded: bf16 windows are exact at any precision; f32 windows need
    HIGHEST (3-pass bf16 emulation carries the full f32 mantissa)."""
    prec = (jax.lax.Precision.HIGHEST
            if wins.dtype == jnp.float32 else None)
    onehot = _onehot_for(localT, wins.shape[1], wins.dtype)
    return jnp.einsum("twc,twe->tec", wins, onehot,
                      precision=prec).astype(out_dtype)


def _scatter_xla(g, localT, window):
    """Transpose of _resolve_xla: [T, MtK, C] cotangents -> [T, Wsz, C] f32
    per-window sums (the same transposed one-hot contraction the Pallas
    backward kernel runs; f32 accumulation via preferred_element_type)."""
    onehot = _onehot_for(localT, window, g.dtype)
    prec = (jax.lax.Precision.HIGHEST
            if g.dtype == jnp.float32 else None)
    return jnp.einsum("tec,twe->twc", g, onehot, precision=prec,
                      preferred_element_type=jnp.float32)


def _edge_chunk(MtK: int, Wsz: int, budget: int) -> int:
    """Edge-dim chunk so the [Wsz, chunk] one-hot + iota scratch stays small
    (a full-MtK operand blew the 16MB scoped-vmem stack on chip). Shared by
    the kernels and by the _plan_grid VMEM estimators, which must mirror the
    kernels' allocation pattern exactly."""
    chunk = min(MtK, max(128, (budget // max(Wsz, 1)) // 128 * 128))
    while MtK % chunk:  # lane-dim slices must stay 128-aligned
        chunk -= 128
    return chunk


def _fwd_kernel(win_ref, loc_ref, out_ref):
    """Resolve edges from the VMEM window by a one-hot MXU matmul.

    The one-hot [Mt*K, Wsz] operand fills the MXU contraction dim, so the
    matmul runs at full block rate regardless of how narrow C is; the VPU
    one-hot build (~1 us per tile) is the body cost. Products are x*1/x*0,
    so the gather is bit-exact in bf16 and f32 alike. (A dynamic-gather
    variant was measured: Mosaic's tpu.dynamic_gather is single-vreg-only,
    and the [T,Wsz,C]->[T,C,Wsz] transpose it forces costs ~1 ms at L0
    scale — more than this whole kernel.)

    Edge positions stay LANE-major ([1, MtK]): a sublane-major [MtK, 1]
    block gets padded to 128 lanes by Mosaic — 8MB of VMEM for 8KB of
    indices.
    """
    G, Wsz, C = win_ref.shape
    MtK = loc_ref.shape[-1]
    chunk = _edge_chunk(MtK, Wsz, 2 ** 19)
    n_chunks = MtK // chunk
    iota = jax.lax.broadcasted_iota(jnp.int32, (Wsz, chunk), 0)

    def body(i, _):
        t = i // n_chunks
        e = (i % n_chunks) * chunk
        win = win_ref[t]                            # [Wsz, C]
        lc = loc_ref[t, :, pl.dslice(e, chunk)]     # [1, chunk]
        onehot = (iota == lc).astype(win.dtype)     # [Wsz, chunk]
        out_ref[t, pl.dslice(e, chunk)] = jax.lax.dot_general(
            onehot, win, (((0,), (0,)), ((), ())),  # onehot^T @ win
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
        return ()

    # fori_loop (not a python loop): straight-line unrolled iterations would
    # each get their own stack slot for every operand.
    jax.lax.fori_loop(0, G * n_chunks, body, ())


def _bwd_kernel(g_ref, locT_ref, dwin_ref):
    """Scatter cotangents into window slots via the transposed one-hot
    matmul. g blocks arrive in their native dtype (bf16 in mixed-precision
    training — halves the block VMEM); the one-hot products are exact
    selections, and accumulation runs in an f32 scratch accumulator."""
    G, MtK, C = g_ref.shape
    Wsz = dwin_ref.shape[1]
    chunk = _edge_chunk(MtK, Wsz, 2 ** 18)
    iota = jax.lax.broadcasted_iota(jnp.int32, (Wsz, chunk), 0)

    def body(t, _):
        def inner(j, acc):
            e = j * chunk
            g = g_ref[t, pl.dslice(e, chunk)]           # [chunk, C]
            locT = locT_ref[t, :, pl.dslice(e, chunk)]  # [1, chunk]
            onehot_t = (iota == locT).astype(g.dtype)   # [Wsz, chunk]
            return acc + jnp.dot(onehot_t, g,
                                 preferred_element_type=jnp.float32)

        acc = jax.lax.fori_loop(
            0, MtK // chunk, inner, jnp.zeros((Wsz, C), jnp.float32))
        dwin_ref[t] = acc.astype(dwin_ref.dtype)
        return ()

    jax.lax.fori_loop(0, G, body, ())


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


# Plan against 14 MiB of the 16 MiB scoped-VMEM limit: the estimators below
# reproduced two on-chip OOMs to within 2% (16.0M est vs 16.33M real at 2cm
# scale), so 12.5% headroom absorbs the model error.
_SCOPED_VMEM_BUDGET = 14 * 2 ** 20


def _plan_grid(T: int, C: int, est) -> tuple[int, int]:
    """Pick (tiles/step G, feature block Cb) so block buffers + scratch fit
    the scoped-VMEM budget.

    G > 1 amortizes the per-grid-step pipeline overhead (~3-5 us) over
    several tiles. When even a single tile at full C overflows (measured at
    the 2cm/PTF2 and PCF_Large decoder shapes: Wsz*C windows of 2.5-4.6 MiB),
    the feature dim is split across a second grid axis instead — each (t, c)
    step resolves a Cb-wide slab, re-reading only the tiny localT block.
    est(G, Cb) must mirror the kernel's allocations (double-buffered blocks,
    lane pad to 128, sublane pad to 8)."""
    for Cb in range(C, 0, -1):
        if C % Cb or est(1, Cb) > _SCOPED_VMEM_BUDGET:
            continue
        G = min(8, T)
        while G > 1 and (T % G or est(G, Cb) > _SCOPED_VMEM_BUDGET):
            G -= 1
        return G, Cb
    return 1, 1


def _resolve(windows, localT, out_dtype, interpret):
    """[T, Wsz, C] windows + [T, 1, Mt*K] positions -> [T, Mt*K, C]."""
    T, Wsz, C = windows.shape
    MtK = localT.shape[-1]
    isz = windows.dtype.itemsize
    osz = jnp.dtype(out_dtype).itemsize
    chunk = _edge_chunk(MtK, Wsz, 2 ** 19)

    def est(G, Cb):
        blocks = G * (Wsz * _pad128(Cb) * isz + MtK * _pad128(Cb) * osz
                      + 8 * MtK * 4)
        scratch = Wsz * chunk * (4 + isz) + chunk * _pad128(Cb) * osz
        return 2 * blocks + scratch

    G, Cb = _plan_grid(T, C, est)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(T // G, C // Cb),
        in_specs=[
            pl.BlockSpec((G, Wsz, Cb), lambda t, c: (t, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, MtK), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, MtK, Cb), lambda t, c: (t, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, MtK, C), out_dtype),
        interpret=interpret,
    )(windows, localT)


def _scatter_to_windows(g, localT, window, interpret):
    """[T, Mt*K, C] cotangents -> [T, Wsz, C] f32 per-window sums
    (transpose of _resolve)."""
    T, MtK, C = g.shape
    gsz = g.dtype.itemsize
    chunk = _edge_chunk(MtK, window, 2 ** 18)

    def est(G, Cb):
        # the [Wsz, chunk] one-hot/iota and the [Wsz, Cb] f32 accumulator are
        # fori_loop-reused scratch slots, not per-tile blocks — only block
        # buffers scale with G
        blocks = G * (MtK * _pad128(Cb) * gsz + window * _pad128(Cb) * 4
                      + 8 * MtK * 4)
        scratch = (window * chunk * (4 + gsz) + window * _pad128(Cb) * 4
                   + chunk * _pad128(Cb) * gsz)
        return 2 * blocks + scratch

    G, Cb = _plan_grid(T, C, est)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(T // G, C // Cb),
        in_specs=[
            pl.BlockSpec((G, MtK, Cb), lambda t, c: (t, 0, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, MtK), lambda t, c: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, window, Cb), lambda t, c: (t, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, window, C), jnp.float32),
        interpret=interpret,
    )(g, localT)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _windowed_take(out_shape, interpret, impl, table, window_rows, localT):
    wins = jnp.take(table, window_rows, axis=0, mode="clip")   # [T, Wsz, C]
    if impl == "xla":
        out = _resolve_xla(wins, localT, table.dtype)
    else:
        out = _resolve(wins, localT, table.dtype, interpret)
    return out.reshape(out_shape + (table.shape[-1],))


def _windowed_take_fwd(out_shape, interpret, impl, table, window_rows, localT):
    return (_windowed_take(out_shape, interpret, impl, table, window_rows,
                           localT),
            (window_rows, localT, table))


def _windowed_take_bwd(out_shape, interpret, impl, res, g):
    # `table` rides the residuals only for its shape/dtype (it is a saved
    # input either way — no extra memory).
    window_rows, localT, table = res
    T, Wsz = window_rows.shape
    MtK = localT.shape[-1]
    C = g.shape[-1]
    if impl == "xla":
        dwin = _scatter_xla(g.reshape(T, MtK, C), localT, Wsz)
    else:
        dwin = _scatter_to_windows(g.reshape(T, MtK, C), localT, Wsz,
                                   interpret)
    dtable = jnp.zeros(table.shape, jnp.float32).at[
        window_rows.reshape(-1)].add(dwin.reshape(T * Wsz, C), mode="drop")
    return dtable.astype(table.dtype), None, None


_windowed_take.defvjp(_windowed_take_fwd, _windowed_take_bwd)


def windowed_take(table: jnp.ndarray, edges: WindowedEdges,
                  interpret: bool | None = None,
                  impl: str | None = None) -> jnp.ndarray:
    """table[edges.nei] via the windowed path: [N, C] -> [M, K, C].

    `impl` selects the resolve implementation ("xla"/"pallas") and is baked
    into the custom_vjp's static args at trace time, so forward and backward
    always agree; None defaults from the module setting (set_resolve_impl,
    which the models seed from cfg.resolve_impl at the top of each trace)."""
    if interpret is None:
        interpret = _interpret_default()
    M, K = edges.nei.shape
    return _windowed_take((M, K), interpret, impl or _RESOLVE_IMPL, table,
                          edges.window_rows, edges.localT)


def windowed_take_cm(table: jnp.ndarray, edges: WindowedEdges) -> jnp.ndarray:
    """table[edges.nei] CHANNEL-MAJOR: [N, C] -> [C, M, K].

    The one-hot einsum emits the cm orientation directly
    (`"twc,twe->cte"` -> [C, T, MtK]; MtK is m-major, so the reshape to
    [C, M, K] is a pure leading split/merge — no relayout). The minor dim
    stays M*K (unpadded) instead of the row-major form's 128-lane-padded
    narrow C, and XLA's layout assignment already prefers M-minor for the
    geometry chain's consumers (the {0,2,1} copies in the r4 audit were
    XLA transposing into exactly this form). f32 tables ride HIGHEST so
    the selection products are exact; gradients flow via the einsum's
    derived transpose (geometry callers stop_gradient anyway)."""
    M, K = edges.nei.shape
    C = table.shape[-1]
    wins = jnp.take(table, edges.window_rows, axis=0, mode="clip")
    onehot = _onehot_for(edges.localT, wins.shape[1], wins.dtype)
    prec = (jax.lax.Precision.HIGHEST
            if wins.dtype == jnp.float32 else None)
    out = jnp.einsum("twc,twe->cte", wins, onehot, precision=prec)
    return out.reshape(C, M, K)


def _fwd_kernel_flat(win_ref, loc_ref, out_ref):
    """Resolve edges AND fold k into lanes: [G, Wsz, C] + [G, 1, Mt*K]
    -> [G, Mt, K*C] (k-major flat rows).

    Same one-hot MXU resolve as _fwd_kernel; the [chunk, C] edge-major
    result of each chunk is folded (chunk, C) -> (chunk/K, K*C) in VMEM
    before the store, so the HBM output carries K*C lanes instead of a
    C-lane minor dim that would pad up to 128/C x (RESULTS.md r3/r4: the
    padded [M, K, c] materializations are the eval's dominant traffic).
    The fold is a sublane->lane relayout on a VMEM value — paid once per
    chunk, far from HBM.
    """
    G, Wsz, C = win_ref.shape
    Mt, KC = out_ref.shape[1], out_ref.shape[2]
    K = KC // C
    MtK = loc_ref.shape[-1]
    chunk = _edge_chunk(MtK, Wsz, 2 ** 19)
    n_chunks = MtK // chunk
    pts_c = chunk // K
    iota = jax.lax.broadcasted_iota(jnp.int32, (Wsz, chunk), 0)

    def body(i, _):
        t = i // n_chunks
        j = i % n_chunks
        e = j * chunk
        win = win_ref[t]                            # [Wsz, C]
        lc = loc_ref[t, :, pl.dslice(e, chunk)]     # [1, chunk]
        onehot = (iota == lc).astype(win.dtype)     # [Wsz, chunk]
        feat = jax.lax.dot_general(
            onehot, win, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(out_ref.dtype)
        out_ref[t, pl.dslice(j * pts_c, pts_c)] = feat.reshape(pts_c, K * C)
        return ()

    jax.lax.fori_loop(0, G * n_chunks, body, ())


def windowed_take_flat(table: jnp.ndarray, edges: WindowedEdges,
                       interpret: bool | None = None) -> jnp.ndarray:
    """table[edges.nei] in k-major FLAT layout: [N, C] -> [M, K*C].

    out[m, k*C + c] == table[edges.nei[m, k], c]. The flat form's minor dim
    K*C lane-pads 1-2.7x instead of the 3-D form's 128/C x — the narrow-C
    geometry gathers (C=3/6) are the 21x-padded HBM term of the r3 layout
    study. Geometry is gradient-free data: no VJP is defined — wrap the
    call in lax.stop_gradient semantics at the call site (the flat-geom
    stage hoist does).
    """
    if interpret is None:
        interpret = _interpret_default()
    M, K = edges.nei.shape
    T, Wsz = edges.window_rows.shape
    MtK = edges.localT.shape[-1]
    Mt = MtK // K
    C = table.shape[-1]
    isz = table.dtype.itemsize
    chunk = _edge_chunk(MtK, Wsz, 2 ** 19)

    if not interpret and C != 128:
        # Mosaic rejects the in-kernel (chunk, C) -> (chunk/K, K*C) fold for
        # any C other than a full 128-lane vreg ("infer-vector-layout:
        # unsupported shape cast", probed across C in {6,8,16,32} f32/bf16 on
        # the real toolchain, 2026-08-20) — the interpreter accepts it, which
        # is exactly the r2 "interpreter-only proof" trap. Fall back to the
        # 3-D resolve + one XLA relayout so flat callers stay correct.
        return windowed_take(table, edges, interpret).reshape(M, K * C)

    wins = jnp.take(table, edges.window_rows, axis=0, mode="clip")

    def est(G, Cb):
        del Cb  # the fold needs the full C per chunk; no feature split
        blocks = G * (Wsz * _pad128(C) * isz + Mt * _pad128(K * C) * isz
                      + 8 * MtK * 4)
        scratch = Wsz * chunk * (4 + isz) + chunk * _pad128(C) * isz
        return 2 * blocks + scratch

    if chunk % K or est(1, C) > _SCOPED_VMEM_BUDGET:
        # K not dividing the 128-aligned edge chunk, or a window block too
        # large for the no-feature-split fold: take the 3-D path and fold
        # outside (correct, pays one relayout).
        return windowed_take(table, edges, interpret).reshape(M, K * C)
    G = min(8, T)
    while G > 1 and (T % G or est(G, C) > _SCOPED_VMEM_BUDGET):
        G -= 1
    out = pl.pallas_call(
        _fwd_kernel_flat,
        grid=(T // G,),
        in_specs=[
            pl.BlockSpec((G, Wsz, C), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, MtK), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Mt, K * C), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, Mt, K * C), table.dtype),
        interpret=interpret,
    )(wins, edges.localT)
    return out.reshape(M, K * C)
