"""Multi-head guidance — the attention that modulates PointConv weights.

Reference: layers.py:23-114. Two variants:
  * MultiHeadGuidance — subtractive attention: scores = MLP(q - k) with
    ReLU between layers and a sigmoid at the end (NOT softmax; the gating is
    per-neighbor, layers.py:52-68).
  * MultiHeadGuidanceQK — scaled dot-product q·k per head, sigmoid
    (layers.py:77-114); the key is the center (first) neighbor only.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from pcf_tpu.nn.norm import LinearBN


class MultiHeadGuidance(nn.Module):
    num_heads: int
    num_hiddens: int
    layer_norm_guidance: bool = False
    use_bn: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self,
        guidance_query: jnp.ndarray,  # [M, K, C]
        guidance_key: jnp.ndarray,    # [M, K, C]
        mask=None,
        train: bool = False,
    ) -> jnp.ndarray:
        if self.layer_norm_guidance:
            guidance_query = nn.LayerNorm(name="layer_norm_q")(guidance_query)
            guidance_key = nn.LayerNorm(name="layer_norm_k")(guidance_key)
        scores = guidance_query - guidance_key
        # MLP [C -> 8 -> num_heads] (reference mlp_dim, layers.py:40)
        dims = [8, self.num_heads]
        for i, d in enumerate(dims):
            scores = LinearBN(d, use_bn=self.use_bn, axis_name=self.axis_name,
                              dtype=self.dtype,
                              name=f"mlp_{i}")(scores, mask=mask, train=train)
            scores = nn.sigmoid(scores) if i == len(dims) - 1 else nn.relu(scores)
        return scores  # [M, K, num_heads]


class MultiHeadGuidanceQK(nn.Module):
    num_heads: int
    num_hiddens: int
    key_dim: int = 16
    use_bn: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, mask=None, train: bool = False):
        assert self.num_hiddens % self.num_heads == 0
        M, K, _ = q.shape
        qk = LinearBN(self.key_dim * self.num_heads, use_bn=self.use_bn,
                      axis_name=self.axis_name, dtype=self.dtype,
                      name="qk_linear")
        q = qk(q, mask=mask, train=train).reshape(M, K, self.num_heads, self.key_dim)
        k = qk(k, mask=mask, train=train).reshape(M, K, self.num_heads, self.key_dim)
        # only the center's key matters (reference: layers.py:103)
        k0 = k[:, :1]  # [M, 1, H, D]
        attn = jnp.sum(q * k0, axis=-1) * (self.key_dim ** -0.5)  # [M, K, H]
        return nn.sigmoid(attn)
