"""Normalization blocks with padding-mask support.

The reference normalizes over the packed point dimension with BatchNorm
(layer_utils.py:241-277 Linear_BN, :281-319 UnaryBlock) and converts to
SyncBatchNorm under DDP. On TPU the packed batch is padded to static shapes,
so batch statistics must exclude padding rows — plain flax BatchNorm would
silently fold zeros into the stats (SURVEY.md §7 "BatchNorm semantics").

MaskedBatchNorm:
  * computes masked mean/var over all non-feature axes,
  * keeps torch-style running stats (running = (1-m)*running + m*batch,
    unbiased batch var for the running update, biased for normalization),
  * optionally psum-reduces stats over a named mesh axis — the TPU-native
    SyncBatchNorm (reference: train_ScanNet_DDP_WarmUP.py:192-193).

Inference-time BN fusion (util/common_util.py:237-247, layer_utils.fuse) is
unnecessary here: with use_running_average=True the scale/shift is a constant
elementwise op that XLA folds into the adjacent matmul.
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all leading axes with an optional validity mask."""

    features: int
    momentum: float = 0.1  # torch convention: new = (1-m)*old + m*batch
    eps: float = 1e-5
    scale_init: Callable = nn.initializers.ones
    bias_init: Callable = nn.initializers.zeros
    axis_name: Optional[str] = None  # psum stats over this mesh axis (SyncBN)
    # flat-lane mode (r4 flat-geom path): x is [..., K*features] with k-major
    # lanes; stats/params stay per-channel (identical tree to the 3-D form,
    # checkpoints interchange) and are tiled across the K lane groups.
    flat_k: int = 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: jnp.ndarray | None = None,
        use_running_average: bool = False,
    ) -> jnp.ndarray:
        scale = self.param("scale", self.scale_init, (self.features,))
        bias = self.param("bias", self.bias_init, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(self.features, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(self.features, jnp.float32)
        )

        K = self.flat_k
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            reduce_axes = tuple(range(x.ndim - 1))

            def _lane_fold(v):  # [K*features] per-lane sums -> per-channel
                return v.reshape(K, self.features).sum(0) if K else v

            if mask is None:
                cnt = jnp.float32(x.size // self.features)
                s = _lane_fold(jnp.sum(xf, axis=reduce_axes))
                s2 = _lane_fold(jnp.sum(xf * xf, axis=reduce_axes))
            else:
                m = jnp.broadcast_to(
                    mask.astype(jnp.float32).reshape(mask.shape + (1,) * (x.ndim - mask.ndim)),
                    x.shape[:-1] + (1,),
                )
                cnt = (jnp.sum(m) + 0.0) * max(K, 1)
                s = _lane_fold(jnp.sum(xf * m, axis=reduce_axes))
                s2 = _lane_fold(jnp.sum(xf * xf * m, axis=reduce_axes))
            if self.axis_name is not None and not self.is_initializing():
                s = jax.lax.psum(s, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
                cnt = jax.lax.psum(cnt, self.axis_name)
            cnt = jnp.maximum(cnt, 1.0)
            mean = s / cnt
            var = jnp.maximum(s2 / cnt - mean * mean, 0.0)

            if not self.is_initializing():
                unbiased = var * cnt / jnp.maximum(cnt - 1.0, 1.0)
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * unbiased

        inv = jax.lax.rsqrt(var + self.eps)
        if K:  # same arithmetic, per-channel terms tiled across lane groups
            mean, inv = jnp.tile(mean, K), jnp.tile(inv, K)
            scale, bias = jnp.tile(scale, K), jnp.tile(bias, K)
        y = (x.astype(jnp.float32) - mean) * inv * scale + bias
        return y.astype(x.dtype)


class _FlatDense(nn.Module):
    """Per-edge Dense in flat-lane layout: [M, K*in_c] -> [M, K*out_dim].

    Param tree identical to nn.Dense ("kernel" [in_c, out_dim], "bias"
    [out_dim]) so 3-D and flat checkpoints interchange; the kernel is
    expanded to kron(I_K, kernel) at apply time (a [K*in, K*out] constant
    per step — trivial next to the [M, ...] matmul it feeds)."""

    out_dim: int
    flat_k: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from pcf_tpu.nn.init import torch_linear_bias, torch_linear_kernel

        K = self.flat_k
        in_c = x.shape[-1] // K
        kernel = self.param("kernel", torch_linear_kernel,
                            (in_c, self.out_dim))
        bias = self.param("bias", torch_linear_bias(in_c), (self.out_dim,))
        eye = jnp.eye(K, dtype=kernel.dtype)
        bd = jnp.einsum("ij,ab->iajb", eye, kernel).reshape(
            K * in_c, K * self.out_dim)
        if self.dtype is not None:
            x, bd = x.astype(self.dtype), bd.astype(self.dtype)
        y = x @ bd + jnp.tile(bias, K).astype(x.dtype)
        return y


class LinearBN(nn.Module):
    """Dense + MaskedBatchNorm (reference: layer_utils.py Linear_BN:241-277).

    The reference distinguishes bn_ver '1d'/'2d' only because torch BN wants
    channels second; here stats always reduce over every non-feature axis, so
    one module covers both.
    """

    out_dim: int
    bn_weight_init: float = 1.0
    bn_momentum: float = 0.1
    axis_name: Optional[str] = None
    use_bn: bool = True
    dtype: Optional[jnp.dtype] = None  # computation dtype (bf16 on TPU)
    # flat-lane mode: x is [M, K*in_c] k-major; the Dense kernel stays
    # [in_c, out_dim] (identical param tree) and is applied as one
    # block-diagonal kron(I_K, kernel) matmul — [M, K*in] @ [K*in, K*out]
    # hits the MXU with no lane padding instead of K-sliced narrow dots.
    flat_k: int = 0

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray | None = None, train: bool = False
    ) -> jnp.ndarray:
        from pcf_tpu.nn.init import torch_linear_bias, torch_linear_kernel

        # Layout note (measured, r3): flattening [...,K,C] inputs to 2-D
        # around the Dense+BN won a standalone microbenchmark
        # (benchmarks/layout_bench.py: 1.32 vs 1.45 ms) but REGRESSED the
        # full model 62% (flagship eval 22.6 -> 36.5 ms on chip,
        # battery_results/mb_flat.log): the inserted reshapes break XLA's
        # producer->consumer fusions and force materialized relayouts at
        # every 3-D consumer. Keep the natural 3-D shapes and let XLA fuse.
        # (The r4 flat_k path is different: the WHOLE geometry chain stays
        # flat from the resolve kernel on, so no reshape ever crosses a
        # fusion boundary — see nn/layers.py flat-geom wiring.)
        K = self.flat_k
        if K:
            x = _FlatDense(self.out_dim, K, dtype=self.dtype, name="c")(x)
        else:
            x = nn.Dense(self.out_dim, dtype=self.dtype, name="c",
                         kernel_init=torch_linear_kernel,
                         bias_init=torch_linear_bias(x.shape[-1]))(x)
        if self.use_bn:
            x = MaskedBatchNorm(
                self.out_dim,
                momentum=self.bn_momentum,
                scale_init=nn.initializers.constant(self.bn_weight_init),
                axis_name=self.axis_name,
                flat_k=K,
                name="bn",
            )(x, mask=mask, use_running_average=not train)
        return x


class UnaryBlock(nn.Module):
    """Linear(+BN) + LeakyReLU(0.1) (reference: layer_utils.py:281-319)."""

    out_dim: int
    use_bn: bool = True
    bn_momentum: float = 0.1
    no_relu: bool = False
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray | None = None, train: bool = False
    ) -> jnp.ndarray:
        x = LinearBN(
            self.out_dim,
            bn_momentum=self.bn_momentum,
            axis_name=self.axis_name,
            use_bn=self.use_bn,
            dtype=self.dtype,
            name="mlp",
        )(x, mask=mask, train=train)
        if not self.no_relu:
            x = nn.leaky_relu(x, negative_slope=0.1)
        return x
