"""PointConv / PCF contraction ops — XLA reference paths.

These are the compute cores that the reference implements five ways in CUDA
(cpp_wrappers/cpp_pcf_kernel/src/{pcf_ops.cu,pconv_ops.cu}): gather neighbor
features, optionally modulate by multi-head guidance, contract over the K
neighbor dim against WeightNet outputs, and optionally apply a output linear.

Here each is a single XLA program: the gather lowers to a native TPU gather
and the K-contraction to a batched `dot_general` (batch dim = points), which
XLA fuses with the surrounding elementwise work. A Pallas fused kernel
(pcf_tpu/ops/pallas) provides the production path, with these as the
always-available ground truth (the reference's USE_CUDA_KERNEL=False path,
layers.py:386-392,713-716) for parity tests.

Layout contract (matches reference): the contraction output for point m is
`vec(A_m^T @ W_m)` with A_m=[K, C] gathered (+additional) features and
W_m=[K, C_mid] weightnet outputs, flattened c-major: out[m, c*C_mid + w]
(reference: layers.py:713-716; pconv_ops.cu:26-38).

Guidance head mapping: channel c of the gathered features is modulated by
guidance head `c % num_heads` (reference: pcf_ops.cu:58-68; layers.py:386-388).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from pcf_tpu.ops.gather import index_points


def guided_contraction(
    gathered: jnp.ndarray, guidance: jnp.ndarray
) -> jnp.ndarray:
    """Modulate gathered features [M, K, C] by guidance scores [M, K, H].

    Channel c uses head c % H (reference: pcf_ops.cu:58-68).
    """
    M, K, C = gathered.shape
    H = guidance.shape[-1]
    assert C % H == 0, f"channels {C} not divisible by heads {H}"
    g = gathered.reshape(M, K, C // H, H) * guidance[:, :, None, :]
    return g.reshape(M, K, C)


def pconv(
    gathered_feat: jnp.ndarray,
    weights: jnp.ndarray,
    *,
    preferred_dtype=jnp.float32,
    precision=lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """PointConv K-contraction: [M, K, C] x [M, K, W] -> [M, C*W] (c-major).

    Reference op: pcf_cuda.pconv_forward minus the gather
    (pconv_ops.cu:39-103) / the unfused matmul at layers.py:713-716.
    Defaults to full-f32 precision: this is the ground-truth path; the
    production path trades precision deliberately (bf16 inputs).
    """
    M, K, C = gathered_feat.shape
    W = weights.shape[-1]
    if precision is None:
        # Production path (default MXU precision): the batched dot_general
        # lowers to XLA's dilated-convolution emitter, which runs the M
        # per-point [C,K]x[K,W] matmuls at ~0.1% MFU (measured 2.1 ms at
        # M=40960,K=C=W=16 on v5e). The same contraction as a broadcast
        # multiply + K-reduction stays on the VPU and fuses: 0.23 ms (bf16
        # inputs) / 1.0 ms (f32). Products round to the input dtype before
        # the f32 accumulation — one extra bf16 rounding vs the MXU's exact
        # f32 products, same order as the bf16 activation noise (bf16
        # logits/mIoU parity covered by tests/test_bf16.py).
        prod = gathered_feat[:, :, :, None] * weights[:, :, None, :]
        return prod.astype(preferred_dtype).sum(axis=1).reshape(M, C * W)
    out = lax.dot_general(
        gathered_feat,
        weights,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),  # contract K, batch M
        preferred_element_type=preferred_dtype,
        precision=precision,
    )  # [M, C, W]
    return out.reshape(M, C * W)


def pconv_gather(
    feats: jnp.ndarray,
    nei_inds: jnp.ndarray,
    weights: jnp.ndarray,
    additional_features: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Full PConv: gather + optional PE concat + contraction.

    Reference op: pcf_cuda.pconv_forward (pconv_ops.cu:26-103), where
    `additional_features` [M, K, C_add] (position encodings) are concatenated
    to the gathered features before the K-contraction.
    """
    gathered = index_points(feats, nei_inds)  # [M, K, C]
    if additional_features is not None:
        gathered = jnp.concatenate([gathered, additional_features], axis=-1)
    return pconv(gathered, weights)


def pconv_linear(
    feats: jnp.ndarray,
    nei_inds: jnp.ndarray,
    weights: jnp.ndarray,
    linear_w: jnp.ndarray,
    linear_b: jnp.ndarray | None,
    additional_features: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fused PConv + Linear (reference: pcf_cuda.pconv_linear_cutlass_forward,
    pconv_ops.cu:950-1269, and the PCONV_OPT autograd path layer_utils.py:42-86).

    linear_w: [C*W, out] (column-major application: out = x @ linear_w + b).
    In XLA this is one fused program; the inverse-kNN machinery the reference
    needs for its optimized backward (knn.cu) is unnecessary — XLA derives the
    scatter-add transpose of the gather automatically.
    """
    out = pconv_gather(feats, nei_inds, weights, additional_features)
    out = jnp.matmul(out, linear_w, precision=lax.Precision.HIGHEST)
    if linear_b is not None:
        out = out + linear_b
    return out


def pcf_conv(
    feats: jnp.ndarray,
    nei_inds: jnp.ndarray,
    guidance: jnp.ndarray,
    weights: jnp.ndarray,
) -> jnp.ndarray:
    """Full PCF op: gather + guidance modulation + contraction.

    Reference op: pcf_cuda.pcf_forward (pcf_ops.cu:26-71):
      out[m, c*W + w] = sum_k feats[nei[m,k], c] * guidance[m,k,c%H] * weights[m,k,w]
    """
    gathered = index_points(feats, nei_inds)  # [M, K, C]
    return pconv(guided_contraction(gathered, guidance), weights)
