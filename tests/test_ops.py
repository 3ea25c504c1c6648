"""Oracle tests for the M0 ops layer: gather, VI transform, contractions.

Pattern follows the reference's dual-implementation parity strategy
(cpp_wrappers/cpp_pcf_kernel/test_kernels.py): every op is checked against a
tiny, obviously-correct numpy implementation, forward and (where meaningful)
gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcf_tpu.ops import (
    VI_coordinate_transform,
    guided_contraction,
    index_points,
    pconv,
    pcf_conv,
    pconv_linear,
)
from pcf_tpu.ops.pconv import pconv_gather


def test_index_points_2d(rng):
    pts = rng.normal(size=(20, 5)).astype(np.float32)
    idx = rng.integers(0, 20, size=(7, 3))
    out = index_points(jnp.asarray(pts), jnp.asarray(idx))
    assert out.shape == (7, 3, 5)
    np.testing.assert_allclose(np.asarray(out), pts[idx])


def test_index_points_batched(rng):
    pts = rng.normal(size=(2, 20, 5)).astype(np.float32)
    idx = rng.integers(0, 20, size=(2, 7, 3))
    out = index_points(jnp.asarray(pts), jnp.asarray(idx))
    expected = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(np.asarray(out), expected)


def _np_vi(localized, gnorm, snorm):
    """Numpy oracle for the 12-dim VI transform (layer_utils.py:176-231)."""
    eps = 1e-12

    def norm(x):
        n = np.linalg.norm(x, axis=-1, keepdims=True)
        return x / np.maximum(n, eps)

    ns = snorm[:, None, :]
    r_hat = norm(localized)
    v = ns - np.sum(ns * r_hat, -1, keepdims=True) * r_hat
    v = norm(v)
    w = norm(np.cross(r_hat, v))
    t1 = np.sum(gnorm * ns, -1, keepdims=True)
    t2 = np.sum(r_hat * ns, -1, keepdims=True)
    t3 = np.sum(r_hat * gnorm, -1, keepdims=True)
    t4 = np.sum(localized * ns, -1, keepdims=True)
    t5 = t3.copy()
    t6 = np.sum(gnorm * v, -1, keepdims=True)
    t7 = np.sum(gnorm * w, -1, keepdims=True)
    t8 = np.sum(localized * np.cross(gnorm, np.broadcast_to(ns, gnorm.shape)), -1, keepdims=True)
    t9 = np.linalg.norm(localized, axis=-1, keepdims=True)
    return np.concatenate([t1, t2, t3, t4, t5, t6, t7, t8, t9, localized], -1)


def test_vi_transform(rng):
    M, K = 11, 6
    localized = rng.normal(size=(M, K, 3)).astype(np.float32)
    gnorm = rng.normal(size=(M, K, 3)).astype(np.float32)
    gnorm /= np.linalg.norm(gnorm, axis=-1, keepdims=True)
    snorm = rng.normal(size=(M, 3)).astype(np.float32)
    snorm /= np.linalg.norm(snorm, axis=-1, keepdims=True)

    out = VI_coordinate_transform(
        jnp.asarray(localized), jnp.asarray(gnorm), jnp.asarray(snorm), K
    )
    assert out.shape == (M, K, 12)
    np.testing.assert_allclose(np.asarray(out), _np_vi(localized, gnorm, snorm), atol=1e-5)


def test_vi_transform_rotation_invariance(rng):
    """theta1..theta9 must be invariant to a global rotation."""
    M, K = 8, 5
    localized = rng.normal(size=(M, K, 3)).astype(np.float32)
    gnorm = rng.normal(size=(M, K, 3)).astype(np.float32)
    snorm = rng.normal(size=(M, 3)).astype(np.float32)
    # random rotation
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    q = q.astype(np.float32)

    a = VI_coordinate_transform(jnp.asarray(localized), jnp.asarray(gnorm), jnp.asarray(snorm))
    b = VI_coordinate_transform(
        jnp.asarray(localized @ q.T), jnp.asarray(gnorm @ q.T), jnp.asarray(snorm @ q.T)
    )
    np.testing.assert_allclose(np.asarray(a[..., :9]), np.asarray(b[..., :9]), atol=1e-4)


def _np_pconv(gathered, weights):
    # out[m, c*W + w] = sum_k gathered[m,k,c] * weights[m,k,w]
    return np.einsum("mkc,mkw->mcw", gathered, weights).reshape(gathered.shape[0], -1)


def test_pconv_oracle(rng):
    M, K, C, W = 9, 4, 6, 3
    g = rng.normal(size=(M, K, C)).astype(np.float32)
    w = rng.normal(size=(M, K, W)).astype(np.float32)
    out = pconv(jnp.asarray(g), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), _np_pconv(g, w), atol=1e-5)


def test_guided_contraction_head_mapping(rng):
    """Channel c must be modulated by head c % H (pcf_ops.cu:58-68)."""
    M, K, C, H = 5, 3, 8, 4
    g = rng.normal(size=(M, K, C)).astype(np.float32)
    guid = rng.normal(size=(M, K, H)).astype(np.float32)
    out = np.asarray(guided_contraction(jnp.asarray(g), jnp.asarray(guid)))
    expected = np.empty_like(g)
    for c in range(C):
        expected[..., c] = g[..., c] * guid[..., c % H]
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_pcf_conv_full(rng):
    M, N, K, C, H, W = 7, 15, 4, 8, 2, 3
    feats = rng.normal(size=(N, C)).astype(np.float32)
    nei = rng.integers(0, N, size=(M, K))
    guid = rng.uniform(size=(M, K, H)).astype(np.float32)
    wts = rng.normal(size=(M, K, W)).astype(np.float32)

    out = pcf_conv(jnp.asarray(feats), jnp.asarray(nei), jnp.asarray(guid), jnp.asarray(wts))
    gathered = feats[nei]
    modulated = np.empty_like(gathered)
    for c in range(C):
        modulated[..., c] = gathered[..., c] * guid[..., c % H]
    np.testing.assert_allclose(np.asarray(out), _np_pconv(modulated, wts), atol=1e-5)


def test_pconv_linear_matches_unfused(rng):
    M, N, K, C, Ca, W, O = 6, 12, 4, 5, 3, 2, 7
    feats = rng.normal(size=(N, C)).astype(np.float32)
    nei = rng.integers(0, N, size=(M, K))
    add = rng.normal(size=(M, K, Ca)).astype(np.float32)
    wts = rng.normal(size=(M, K, W)).astype(np.float32)
    lw = rng.normal(size=((C + Ca) * W, O)).astype(np.float32)
    lb = rng.normal(size=(O,)).astype(np.float32)

    fused = pconv_linear(
        jnp.asarray(feats), jnp.asarray(nei), jnp.asarray(wts),
        jnp.asarray(lw), jnp.asarray(lb), jnp.asarray(add),
    )
    unfused = pconv_gather(jnp.asarray(feats), jnp.asarray(nei), jnp.asarray(wts), jnp.asarray(add))
    expected = np.asarray(unfused) @ lw + lb
    np.testing.assert_allclose(np.asarray(fused), expected, atol=1e-4)


def test_pconv_gradients_match_oracle(rng):
    """Check grads of the XLA path against numeric grads of the numpy oracle
    (mirrors the reference's fwd+all-gradients parity tests, test_kernels.py:216-335)."""
    M, N, K, C, W = 4, 8, 3, 4, 2
    feats = rng.normal(size=(N, C)).astype(np.float32)
    nei = rng.integers(0, N, size=(M, K))
    wts = rng.normal(size=(M, K, W)).astype(np.float32)
    cot = rng.normal(size=(M, C * W)).astype(np.float32)

    def f(feats_, wts_):
        return jnp.sum(pconv_gather(feats_, jnp.asarray(nei), wts_) * cot)

    g_feats, g_wts = jax.grad(f, argnums=(0, 1))(jnp.asarray(feats), jnp.asarray(wts))

    # numeric grads on the numpy oracle
    def f_np(feats_, wts_):
        return float(np.sum(_np_pconv(feats_[nei], wts_) * cot))

    eps = 1e-3
    for _ in range(10):
        i, j = rng.integers(0, N), rng.integers(0, C)
        fp = feats.copy(); fp[i, j] += eps
        fm = feats.copy(); fm[i, j] -= eps
        num = (f_np(fp, wts) - f_np(fm, wts)) / (2 * eps)
        assert abs(float(g_feats[i, j]) - num) < 1e-2, (i, j)
    for _ in range(10):
        m, k, w = rng.integers(0, M), rng.integers(0, K), rng.integers(0, W)
        wp = wts.copy(); wp[m, k, w] += eps
        wm = wts.copy(); wm[m, k, w] -= eps
        num = (f_np(feats, wp) - f_np(feats, wm)) / (2 * eps)
        assert abs(float(g_wts[m, k, w]) - num) < 1e-2, (m, k, w)


def test_vi_transform_flat_matches_3d(rng):
    """vi_transform_flat on [M, K*3] k-major lanes == the 3-D reference
    transform (the flat form is the layout-optimized equal for TPU lane
    packing; selection matmuls run at HIGHEST so f32 data never rounds)."""
    from pcf_tpu.ops.vi_transform import vi_transform_flat

    M, K = 13, 16
    localized = rng.normal(size=(M, K, 3)).astype(np.float32)
    gnorm = rng.normal(size=(M, K, 3)).astype(np.float32)
    gnorm /= np.linalg.norm(gnorm, axis=-1, keepdims=True)
    snorm = rng.normal(size=(M, 3)).astype(np.float32)
    snorm /= np.linalg.norm(snorm, axis=-1, keepdims=True)

    ref = VI_coordinate_transform(
        jnp.asarray(localized), jnp.asarray(gnorm), jnp.asarray(snorm), K)
    flat = vi_transform_flat(
        jnp.asarray(localized.reshape(M, K * 3)),
        jnp.asarray(gnorm.reshape(M, K * 3)),
        jnp.asarray(snorm))
    assert flat.shape == (M, K * 12)
    np.testing.assert_allclose(
        np.asarray(flat).reshape(M, K, 12), np.asarray(ref),
        rtol=1e-5, atol=1e-5)
