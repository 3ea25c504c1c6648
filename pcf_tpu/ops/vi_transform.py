"""Viewpoint-invariant coordinate transform.

Functional JAX port of the VI relative-position encoding of VI-PointConv
(X. Li et al., WACV 2023). Produces, per neighbor, 9 rotation/scale-invariant
scalars followed by the raw localized coordinates (12 dims total).
Reference semantics: layer_utils.py:176-231.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax

_EPS = 1e-12


def _normalize(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    # Matches torch F.normalize: x / max(||x||, eps)
    n = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(n, _EPS)


def VI_coordinate_transform(
    localized_xyz: jnp.ndarray,
    gathered_norm: jnp.ndarray,
    sparse_xyz_norm: jnp.ndarray,
    K: int | None = None,
) -> jnp.ndarray:
    """Compute the 12-dim VI features.

    Args:
      localized_xyz: [..., M, K, 3] relative coordinates (neighbor - center).
      gathered_norm: [..., M, K, 3] surface normals of the neighbors.
      sparse_xyz_norm: [..., M, 3] surface normal of each center point.
      K: unused; kept for signature parity with the reference.

    Returns:
      [..., M, K, 12]: theta1..theta9 followed by localized_xyz.
    """
    del K
    n_s = sparse_xyz_norm[..., None, :]  # [..., M, 1, 3]

    r_hat = _normalize(localized_xyz)
    # Project the center normal off the radial direction -> tangential frame.
    ns_dot_r = jnp.sum(n_s * r_hat, axis=-1, keepdims=True)  # [..., M, K, 1]
    v_miu = _normalize(n_s - ns_dot_r * r_hat)
    w_miu = _normalize(jnp.cross(r_hat, v_miu))

    theta1 = jnp.sum(gathered_norm * n_s, axis=-1)
    theta2 = jnp.squeeze(ns_dot_r, -1)
    theta3 = jnp.sum(r_hat * gathered_norm, axis=-1)
    theta4 = jnp.sum(localized_xyz * n_s, axis=-1)
    # theta5 duplicates theta3 in the reference; kept for exact parity.
    theta5 = jnp.sum(gathered_norm * r_hat, axis=-1)
    theta6 = jnp.sum(gathered_norm * v_miu, axis=-1)
    theta7 = jnp.sum(gathered_norm * w_miu, axis=-1)
    theta8 = jnp.sum(
        localized_xyz * jnp.cross(gathered_norm, jnp.broadcast_to(n_s, gathered_norm.shape)),
        axis=-1,
    )
    theta9 = jnp.linalg.norm(localized_xyz, axis=-1)

    # Stack the scalars on a LEADING axis (contiguous in the major dims —
    # free for XLA) and transpose once, instead of concatenating nine
    # [..., K, 1] slivers on the 128-lane minor axis: on TPU the narrow-lane
    # concat lowered to ~8 ms of layout copies at flagship scale (profiled
    # HLO concatenate over 11 one-lane operands); this form is one cheap
    # layout pass.
    thetas = jnp.stack(
        [theta1, theta2, theta3, theta4, theta5, theta6, theta7, theta8,
         theta9], axis=0)                       # [9, ..., M, K]
    thetas = jnp.moveaxis(thetas, 0, -1)        # [..., M, K, 9]
    return jnp.concatenate([thetas, localized_xyz], axis=-1)


# --------------------------------------------------------------------------
# Flat-lane variant: the whole transform on [M, K*3] -> [M, K*12]
# --------------------------------------------------------------------------
#
# On TPU every [M, K, c] tensor with c in {3, 12} lane-pads c -> 128 when it
# materializes (8-42x the useful bytes, RESULTS.md r3 layout study). The
# per-edge geometry chain (localize -> VI -> WeightNet) is pure per-edge
# arithmetic, so it can run entirely in a k-major FLAT layout [M, K*c]
# (lane index k*c + c'), where K*12 = 192 pads only 1.33x. Segment
# reductions/broadcasts/permutations over each edge's 3-lane group become
# matmuls against tiny constant 0/1 matrices — exact selections, MXU-hosted,
# and free at this model's 0.6% MFU. The 3-D form above stays the reference
# semantics; this is the layout-optimized equal (parity-tested).


@functools.lru_cache(maxsize=8)
def _flat_consts(K: int):
    """Constant 0/1 matrices for per-edge 3-lane-group algebra at width K.

    S3 [3K, K]  sum over each edge's 3 lanes        (x @ S3: [M,3K]->[M,K])
    B3 [K, 3K]  broadcast each edge scalar to 3     (s @ B3: [M,K]->[M,3K])
    T3 [3, 3K]  tile a per-point 3-vector to K edges
    PL/PR [3K, 3K] rotate each 3-group left/right   (cross products)
    EC [9K, 12K] place t-major thetas at lane 12k+t
    EL [3K, 12K] place localized coords at lane 12k+9+c
    """
    S3 = np.zeros((3 * K, K), np.float32)
    T3 = np.zeros((3, 3 * K), np.float32)
    PL = np.zeros((3 * K, 3 * K), np.float32)
    PR = np.zeros((3 * K, 3 * K), np.float32)
    EC = np.zeros((9 * K, 12 * K), np.float32)
    EL = np.zeros((3 * K, 12 * K), np.float32)
    for k in range(K):
        for c in range(3):
            S3[3 * k + c, k] = 1.0
            T3[c, 3 * k + c] = 1.0
            PL[3 * k + (c + 1) % 3, 3 * k + c] = 1.0
            PR[3 * k + (c + 2) % 3, 3 * k + c] = 1.0
            EL[3 * k + c, 12 * k + 9 + c] = 1.0
        for t in range(9):
            EC[t * K + k, 12 * k + t] = 1.0
    # numpy, NOT jnp: jnp.asarray under an active trace returns a tracer,
    # which the lru_cache would leak into the next trace (UnexpectedTracer).
    # XLA stages numpy operands as constants and dedups them by value.
    return (S3, S3.T.copy(), T3, PL, PR, EC, EL)


def _mm(a, b):
    # 0/1 selection matmuls must not round the data operand to bf16 (the
    # TPU default single-pass would): HIGHEST keeps f32 products exact.
    return jnp.dot(a, b, precision=lax.Precision.HIGHEST)


@functools.lru_cache(maxsize=8)
def _geom_split_consts(K: int):
    """Selectors for a k-major [M, K*6] xyz|norm gather: SelX/SelN pick the
    per-edge xyz / normal 3-lane groups; T3 tiles a per-point 3-vector."""
    SelX = np.zeros((6 * K, 3 * K), np.float32)
    SelN = np.zeros((6 * K, 3 * K), np.float32)
    T3 = np.zeros((3, 3 * K), np.float32)
    for k in range(K):
        for c in range(3):
            SelX[6 * k + c, 3 * k + c] = 1.0
            SelN[6 * k + 3 + c, 3 * k + c] = 1.0
            T3[c, 3 * k + c] = 1.0
    return (SelX, SelN, T3)  # numpy constants (see _flat_consts note)


def localize_flat(gathered_xyz_flat: jnp.ndarray,
                  center_xyz: jnp.ndarray) -> jnp.ndarray:
    """[M, K*3] gathered coords minus the tiled centers (flat localize)."""
    K = gathered_xyz_flat.shape[-1] // 3
    _, _, T3 = _geom_split_consts(K)
    return gathered_xyz_flat - _mm(center_xyz.astype(jnp.float32), T3)


def split_geom_flat(flat6: jnp.ndarray):
    """Split a k-major [M, K*6] xyz|norm window gather into ([M, K*3] xyz,
    [M, K*3] norms) via exact selection matmuls (fuse into the VI chain)."""
    K = flat6.shape[-1] // 6
    SelX, SelN, _ = _geom_split_consts(K)
    f = flat6.astype(jnp.float32)
    return _mm(f, SelX), _mm(f, SelN)


def _cross_flat(a, b, PL, PR):
    return _mm(a, PL) * _mm(b, PR) - _mm(a, PR) * _mm(b, PL)


def vi_transform_flat(
    loc_flat: jnp.ndarray,      # [M, K*3] localized coords, k-major
    gn_flat: jnp.ndarray,       # [M, K*3] gathered neighbor normals
    center_norm: jnp.ndarray,   # [M, 3]
) -> jnp.ndarray:
    """VI features in flat-lane layout: [M, K*12], per-k block theta1..9|loc.

    Same math as VI_coordinate_transform on the k-major flat layout;
    `vi_flat.reshape(M, K, 12) == VI_coordinate_transform(...)` to f32
    round-off (tests/test_ops.py)."""
    K = loc_flat.shape[-1] // 3
    S3, B3, T3, PL, PR, EC, EL = _flat_consts(K)
    loc = loc_flat.astype(jnp.float32)
    gn = gn_flat.astype(jnp.float32)

    def sum3(x):          # [M, 3K] -> [M, K]
        return _mm(x, S3)

    def bcast3(s):        # [M, K] -> [M, 3K]
        return _mm(s, B3)

    n2 = sum3(loc * loc)
    norm = jnp.sqrt(n2)
    r_hat = loc * bcast3(1.0 / jnp.maximum(norm, _EPS))
    cn_t = _mm(center_norm.astype(jnp.float32), T3)          # [M, 3K]

    ns_dot_r = sum3(cn_t * r_hat)                            # [M, K]
    v = cn_t - bcast3(ns_dot_r) * r_hat
    v_miu = v * bcast3(1.0 / jnp.maximum(jnp.sqrt(sum3(v * v)), _EPS))
    w = _cross_flat(r_hat, v_miu, PL, PR)
    w_miu = w * bcast3(1.0 / jnp.maximum(jnp.sqrt(sum3(w * w)), _EPS))

    theta3 = sum3(r_hat * gn)
    thetas = jnp.concatenate([
        sum3(gn * cn_t),                   # theta1
        ns_dot_r,                          # theta2
        theta3,                            # theta3
        sum3(loc * cn_t),                  # theta4
        theta3,                            # theta5 (reference duplicate)
        sum3(gn * v_miu),                  # theta6
        sum3(gn * w_miu),                  # theta7
        sum3(loc * _cross_flat(gn, cn_t, PL, PR)),  # theta8
        norm,                              # theta9
    ], axis=-1)                                              # [M, 9K] t-major
    return _mm(thetas, EC) + _mm(loc, EL)                    # [M, 12K]


# --------------------------------------------------------------------------
# Channel-major variant: [3, M, K] -> [12, M, K] (r4)
# --------------------------------------------------------------------------
#
# The r4 traffic audit showed XLA's layout assignment already prefers
# M-minor ("channel-major") layouts for the geometry chain's consumers —
# the {0,2,1} relayout copies after every [M*K, c] gather were XLA
# transposing INTO that form. With the windowed resolve emitting
# channel-major directly (window.windowed_take_cm: einsum "twc,twe->cte",
# minor dim M*K — unpadded), the whole localize -> VI chain runs on full
# 128-lane vregs and never materializes a lane-padded narrow-c buffer.
# Same math as VI_coordinate_transform with the channel axis leading;
# parity pinned by tests/test_cmgeom.py. Measured on chip (r5): the stage-
# boundary moveaxis re-materializes the padded [M,K,c] form and the path
# LOSES ~1-2 ms at flagship (RESULTS.md r5) — kept as a tested, documented
# negative result, default off.


def _normalize_cm(x: jnp.ndarray) -> jnp.ndarray:
    # channel-axis-0 mirror of _normalize (torch F.normalize semantics)
    n = jnp.sqrt(jnp.sum(x * x, axis=0, keepdims=True))
    return x / jnp.maximum(n, _EPS)


def _cross_cm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([a[1] * b[2] - a[2] * b[1],
                      a[2] * b[0] - a[0] * b[2],
                      a[0] * b[1] - a[1] * b[0]], axis=0)


def localize_cm(gathered_xyz_cm: jnp.ndarray,
                center_xyz: jnp.ndarray) -> jnp.ndarray:
    """[3, M, K] gathered coords minus the [M, 3] centers (broadcast)."""
    return gathered_xyz_cm - center_xyz.T[:, :, None]


def vi_transform_cm(
    localized_cm: jnp.ndarray,   # [3, M, K]
    gathered_norm_cm: jnp.ndarray,  # [3, M, K]
    sparse_xyz_norm: jnp.ndarray,   # [M, 3]
) -> jnp.ndarray:
    """VI features channel-major: [12, M, K], rows theta1..9 | localized."""
    loc = localized_cm
    gn = gathered_norm_cm
    n_s = sparse_xyz_norm.T[:, :, None]                       # [3, M, 1]

    r_hat = _normalize_cm(loc)
    ns_dot_r = jnp.sum(n_s * r_hat, axis=0, keepdims=True)    # [1, M, K]
    v_miu = _normalize_cm(n_s - ns_dot_r * r_hat)
    w_miu = _normalize_cm(_cross_cm(r_hat, v_miu))

    theta1 = jnp.sum(gn * n_s, axis=0)
    theta2 = ns_dot_r[0]
    theta3 = jnp.sum(r_hat * gn, axis=0)
    theta4 = jnp.sum(loc * n_s, axis=0)
    theta5 = jnp.sum(gn * r_hat, axis=0)      # dup of theta3 (ref parity)
    theta6 = jnp.sum(gn * v_miu, axis=0)
    theta7 = jnp.sum(gn * w_miu, axis=0)
    theta8 = jnp.sum(loc * _cross_cm(gn, jnp.broadcast_to(n_s, gn.shape)),
                     axis=0)
    theta9 = jnp.sqrt(jnp.sum(loc * loc, axis=0))

    thetas = jnp.stack([theta1, theta2, theta3, theta4, theta5, theta6,
                        theta7, theta8, theta9], axis=0)      # [9, M, K]
    return jnp.concatenate([thetas, loc], axis=0)             # [12, M, K]
