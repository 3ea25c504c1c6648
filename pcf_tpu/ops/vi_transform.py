"""Viewpoint-invariant coordinate transform.

Functional JAX port of the VI relative-position encoding of VI-PointConv
(X. Li et al., WACV 2023). Produces, per neighbor, 9 rotation/scale-invariant
scalars followed by the raw localized coordinates (12 dims total).
Reference semantics: layer_utils.py:176-231.
"""

from __future__ import annotations

import jax.numpy as jnp

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
