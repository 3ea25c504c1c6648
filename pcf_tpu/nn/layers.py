"""PointConv / PointConvFormer layers (flax).

Functional JAX re-design of the reference's layers.py. All layers operate on
the packed point layout without the dummy batch dim: coordinates [N, 3],
features [N, C], neighbor indices [M, K] (M = #output points; M < N for
strided layers). Validity masks for the padded static-shape batches are
threaded into every BatchNorm so padding never pollutes statistics.

Layer map (reference file:line):
  PointConv            layers.py:744-906   first-level conv, no bottleneck
  PointConvStridePE    layers.py:542-741   bottleneck + PE + residual
  PCFLayer             layers.py:194-416   guidance-modulated conv (the PCF block)
  PointConvTransposePE layers.py:909-1105  decoder upsampling conv
  PointTransformerLayer layers.py:419-539  ablation alternative
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcf_tpu.ops.gather import index_points, index_points_multi
from pcf_tpu.ops.pconv import pconv, guided_contraction
from pcf_tpu.ops.vi_transform import VI_coordinate_transform
from pcf_tpu.nn.norm import LinearBN, UnaryBlock
from pcf_tpu.nn.weightnet import WeightNet
from pcf_tpu.nn.guidance import MultiHeadGuidance, MultiHeadGuidanceQK
from pcf_tpu.nn.fused import FusedConvLinear, fused_wins
from pcf_tpu.nn.fused_eval import (
    fused_eval_ok,
    try_pcf_fused_eval,
    try_pointconv_fused_eval,
    try_stride_pe_fused_eval,
    try_transpose_fused_eval,
)
from pcf_tpu.config import as_config


def _dtype_of(cfg):
    # Computation dtype: bf16 halves gather/matmul HBM traffic on TPU;
    # params and BN statistics stay f32 (mixed precision).
    return jnp.bfloat16 if cfg.get('compute_dtype') == 'bfloat16' else None


def _precision_of(cfg):
    """MXU precision for the pconv contraction. 'default' (bf16
    multiplicands, f32 accumulation — the standard TPU mixed-precision
    choice) is 22% faster end-to-end than 'highest' (measured on v5e:
    38.9 -> 30.2 ms flagship eval); 'highest' runs 3-pass f32 emulation
    and is what the reference-parity tests pin."""
    return (jax.lax.Precision.HIGHEST
            if cfg.get("matmul_precision", "default") == "highest" else None)


class DropPath(nn.Module):
    """Stochastic depth on the residual branch (reference uses timm DropPath,
    layers.py:237-238,415). The reference packs every cloud into one
    [1, SUM_N, C] tensor, so timm's per-sample drop (one Bernoulli along
    dim 0) drops the residual branch for the WHOLE batch at once; the
    shipped 2cm/PTF2 config trains with rate 0.2
    (configs/configPCF_2cm_PTF2.yaml:49). Reproduced exactly: one scalar
    keep/drop decision per layer call, scaled by 1/keep when kept."""

    rate: float

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if self.rate == 0.0 or not train:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        mask = jax.random.bernoulli(rng, keep, shape=())
        # observable decision: parity tests mirror it onto the torch side
        self.sow("intermediates", "keep", mask)
        return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)



def _spatial_full(cfg, *tensors):
    """Under spatial (point-dim) sharding, gather-SOURCE tensors must be the
    full per-level arrays while row-aligned tensors (centers, shortcuts,
    outputs) stay sharded. cfg.spatial_axis is set only inside the spatial
    shard_map (pcf_tpu/parallel/spatial.py); one all_gather per source rides
    the ICI and the K-wide gathered tensors stay sharded."""
    ax = cfg.get("spatial_axis")
    if not ax:
        return tensors if len(tensors) > 1 else tensors[0]
    out = tuple(None if t is None else jax.lax.all_gather(t, ax, axis=0, tiled=True)
                for t in tensors)
    return out if len(out) > 1 else out[0]

def _localize(dense_xyz, nei_inds, center_xyz):
    """gathered neighbor coords minus the center: [M, K, 3]."""
    gathered_xyz = index_points(dense_xyz, nei_inds)
    return gathered_xyz, gathered_xyz - center_xyz[:, None, :]


def _gathered_inputs(nei_inds, dense_xyz, center_xyz, feat_tensors,
                     localized_xyz=None, dense_xyz_norm=None,
                     need_norm=False, combine=True):
    """Every same-index gather of a layer in as few passes as possible.

    TPU row-gathers cost per ROW, not per byte (each row reads a whole
    memory tile), so the geometry and all feature tensors ride one combined
    gather per dtype group (ops/gather.index_points_multi). Measured on v5e
    at flagship scale with runtime geometry: train step 171 vs 184 ms,
    eval 44.9 vs 45.8 ms. (An earlier eval measurement that favored
    separate gathers was an artifact of benchmarking with the geometry
    closed over as jit constants — XLA folded those gathers entirely.)
    `localized_xyz` may be precomputed once per stage and shared across
    residual blocks (it only depends on geometry, like the reference's
    cached vi_features, layers.py:346-358).

    Returns (localized_xyz [M,K,3], gathered_norm or None, gathered feature
    tensors in input order).
    """
    reqs = []
    need_xyz = localized_xyz is None
    if need_xyz:
        reqs.append(dense_xyz)
    if need_norm:
        reqs.append(dense_xyz_norm)
    reqs.extend(feat_tensors)
    if combine:
        got = index_points_multi(reqs, nei_inds) if reqs else []
    else:
        got = [index_points(t, nei_inds) for t in reqs]
    i = 0
    if need_xyz:
        localized_xyz = got[i] - center_xyz[:, None, :]
        i += 1
    gathered_norm = None
    if need_norm:
        gathered_norm = got[i]
        i += 1
    return localized_xyz, gathered_norm, got[i:]


def _flat_k(weight_net_input, nei_inds) -> int:
    """K when the hoisted geometry arrived in flat-lane layout [M, K*c]
    (models/backbone._stage_geometry under cfg.flat_geom), else 0. Flat
    geometry keeps the whole VI -> WeightNet chain on unpadded k-major
    lanes; the only unfolds back to [M, K, c] happen at the contraction /
    feature-concat boundaries (see _unfold)."""
    if weight_net_input is not None and weight_net_input.ndim == 2:
        return int(nei_inds.shape[1])
    return 0


def _unfold(x, K: int):
    """[M, K*c] k-major flat -> [M, K, c]."""
    return x.reshape(x.shape[0], K, x.shape[-1] // K)


def _weightnet_input(cfg, localized_xyz, gathered_norm, center_norm,
                     vi_features):
    """VI features (12-d) or raw relative coords (3-d), with per-stage caching
    (reference: layers.py:346-358)."""
    if cfg.USE_VI:
        if vi_features is not None:
            return vi_features
        return VI_coordinate_transform(localized_xyz, gathered_norm, center_norm)
    return localized_xyz


class PointConv(nn.Module):
    """First-layer (VI-)PointConv without bottleneck (layers.py:744-906)."""

    in_channel: int
    out_channel: int
    cfg: Any
    weightnet: Sequence[int] = (9, 16)
    USE_VI: Optional[bool] = None

    @nn.compact
    def __call__(
        self,
        dense_xyz,
        dense_feats,
        nei_inds,
        dense_xyz_norm=None,
        sparse_xyz=None,
        sparse_xyz_norm=None,
        vi_features=None,
        localized_xyz=None,
        dense_mask=None,
        sparse_mask=None,
        train: bool = False,
    ):
        cfg = as_config(self.cfg)
        dtype = _dtype_of(cfg)
        if dtype is not None:
            dense_feats = dense_feats.astype(dtype)
        use_vi = cfg.USE_VI if self.USE_VI is None else self.USE_VI
        center_xyz = sparse_xyz if sparse_xyz is not None else dense_xyz
        center_norm = sparse_xyz_norm if sparse_xyz is not None else dense_xyz_norm
        out_mask = sparse_mask if sparse_xyz is not None else dense_mask

        if fused_eval_ok(cfg, self, nei_inds, train):
            # whole-layer inference kernel (pcf_tpu/attic/eval_kernel.py):
            # resolve + VI + WeightNet + contraction + linear(+BN fold) + ReLU
            new_feat = try_pointconv_fused_eval(
                self, cfg, dense_feats, dense_xyz, dense_xyz_norm, nei_inds,
                center_xyz, center_norm, use_vi)
            return new_feat, None  # dropout is a no-op at inference

        # dispatch BEFORE the gather strategy: a layer outside the kernel's
        # measured win region must run the exact XLA path, combined gathers
        # included (see fused_wins)
        pe_w = (12 if use_vi else 3) if cfg.USE_PE else 0
        use_pallas = bool(cfg.get("USE_PALLAS_KERNEL")) and fused_wins(
            cfg, nei_inds.shape[0], dense_feats.shape[-1] + pe_w,
            self.out_channel)
        src_xyz, src_norm, src_feats = _spatial_full(
            cfg, dense_xyz, dense_xyz_norm, dense_feats)
        # localized_xyz / vi_features may be precomputed once per stage and
        # shared with the same-level residual blocks (same edges): on the
        # flagship that removes a whole 655k-row f32 geometry gather.
        localized_xyz, gathered_norm, gfeats = _gathered_inputs(
            nei_inds, src_xyz, center_xyz,
            [] if use_pallas else [src_feats],
            localized_xyz=localized_xyz, dense_xyz_norm=src_norm,
            need_norm=use_vi and vi_features is None)
        if use_vi:
            weightNetInput = (vi_features if vi_features is not None else
                              VI_coordinate_transform(localized_xyz,
                                                      gathered_norm,
                                                      center_norm))
        else:
            weightNetInput = localized_xyz
        flatK = _flat_k(weightNetInput, nei_inds)

        weights = WeightNet(self.weightnet[1], efficient=True,
                            use_bn=cfg.BATCH_NORM, dtype=dtype, axis_name=cfg.get("bn_axis_name"),
                            flat_k=flatK,
                            name="weightnet")(weightNetInput, mask=out_mask, train=train)
        if flatK:
            weights = _unfold(weights, flatK)
            weightNetInput = _unfold(weightNetInput, flatK)

        if use_pallas:
            # fused gather+PE+contraction+linear (Pallas; the reference's
            # PCONV_OPT path, layers.py:873-887)
            new_feat = FusedConvLinear(
                self.out_channel, use_bn=cfg.BATCH_NORM,
                axis_name=cfg.get("bn_axis_name"), dtype=dtype,
                precision=_precision_of(cfg),
                min_points=cfg.get("fused_min_points", 20480),
                min_cin=cfg.get("fused_min_cin", 64), name="linear")(
                src_feats, nei_inds, weights,
                additional_features=weightNetInput if cfg.USE_PE else None,
                mask=out_mask, train=train)
        else:
            gathered_feat = gfeats[0]  # [M, K, Cin]
            if cfg.USE_PE:
                gathered_feat = jnp.concatenate([gathered_feat, weightNetInput], axis=-1)

            new_feat = pconv(gathered_feat, weights,
                             precision=_precision_of(cfg))  # [M, last_ch*C_mid]
            new_feat = LinearBN(self.out_channel, use_bn=cfg.BATCH_NORM, dtype=dtype,
                                axis_name=cfg.get("bn_axis_name"),
                                name="linear")(new_feat, mask=out_mask, train=train)
        new_feat = nn.relu(new_feat)
        if cfg.dropout_rate > 0.0:
            new_feat = nn.Dropout(cfg.dropout_rate)(new_feat, deterministic=not train)
        return new_feat, weightNetInput


class PointConvStridePE(nn.Module):
    """Bottlenecked PointConv with positional encoding and residual shortcut
    (layers.py:542-741). Used both as the strided downsampling conv and as a
    same-resolution residual block."""

    in_channel: int
    out_channel: int
    cfg: Any
    weightnet: Sequence[int] = (9, 16)

    @nn.compact
    def __call__(
        self,
        dense_xyz,
        dense_feats,
        nei_inds,
        dense_xyz_norm=None,
        sparse_xyz=None,
        sparse_xyz_norm=None,
        vi_features=None,
        localized_xyz=None,
        dense_mask=None,
        sparse_mask=None,
        train: bool = False,
    ):
        cfg = as_config(self.cfg)
        dtype = _dtype_of(cfg)
        if dtype is not None:
            dense_feats = dense_feats.astype(dtype)
        strided = sparse_xyz is not None
        center_xyz = sparse_xyz if strided else dense_xyz
        center_norm = sparse_xyz_norm if strided else dense_xyz_norm
        out_mask = sparse_mask if strided else dense_mask
        axis_name = cfg.get("bn_axis_name")
        last_ch = min(self.out_channel // 4, 32)
        use_pallas = bool(cfg.get("USE_PALLAS_KERNEL")) and fused_wins(
            cfg, nei_inds.shape[0], self.out_channel // 4 + last_ch,
            self.out_channel // 2)

        # First downscaling mlp (bottleneck)
        if self.in_channel != self.out_channel // 4:
            feats_x = UnaryBlock(self.out_channel // 4, use_bn=True, dtype=dtype,
                                 axis_name=axis_name, name="unary1")(
                dense_feats, mask=dense_mask, train=train)
        else:
            feats_x = dense_feats

        if fused_eval_ok(cfg, self, nei_inds, train):
            res = try_stride_pe_fused_eval(
                self, cfg, feats_x, dense_feats, dense_xyz, dense_xyz_norm,
                nei_inds, center_xyz, center_norm, strided)
            if res is not None:
                new_feat, sparse_feats = res
                new_feat = UnaryBlock(
                    self.out_channel, use_bn=True, dtype=dtype, no_relu=True,
                    axis_name=axis_name, name="unary2")(
                    new_feat, mask=out_mask, train=train)
                if self.in_channel != self.out_channel:
                    shortcut = UnaryBlock(
                        self.out_channel, use_bn=True, dtype=dtype,
                        no_relu=True, axis_name=axis_name,
                        name="unary_shortcut")(
                        sparse_feats, mask=out_mask, train=train)
                else:
                    shortcut = sparse_feats
                new_feat = nn.leaky_relu(new_feat + shortcut,
                                         negative_slope=0.1)
                return new_feat, None

        src_xyz, src_norm, src_feats_x, src_dense = _spatial_full(
            cfg, dense_xyz, dense_xyz_norm, feats_x, dense_feats)
        feat_reqs = ([] if use_pallas else [src_feats_x]) + (
            [src_dense] if strided else [])  # shortcut max-pool source
        localized_xyz, gathered_norm, gfeats = _gathered_inputs(
            nei_inds, src_xyz, center_xyz, feat_reqs,
            localized_xyz=localized_xyz, dense_xyz_norm=src_norm,
            need_norm=cfg.USE_VI and vi_features is None)
        weightNetInput = _weightnet_input(
            cfg, localized_xyz, gathered_norm, center_norm, vi_features)
        flatK = _flat_k(weightNetInput, nei_inds)

        # positional encoding branch (layers.py:575-577,669)
        feat_pe = WeightNet(last_ch, hidden_unit=(self.out_channel // 4,),
                            efficient=True, use_bn=cfg.BATCH_NORM, dtype=dtype,
                            axis_name=axis_name, flat_k=flatK, name="pe_convs")(
            localized_xyz, mask=out_mask, train=train)

        weights = WeightNet(self.weightnet[1], efficient=True,
                            use_bn=cfg.BATCH_NORM, dtype=dtype, axis_name=axis_name,
                            flat_k=flatK,
                            name="weightnet")(weightNetInput, mask=out_mask, train=train)
        if flatK:
            feat_pe = _unfold(feat_pe, flatK)
            weights = _unfold(weights, flatK)

        if use_pallas:
            new_feat = FusedConvLinear(
                self.out_channel // 2, use_bn=cfg.BATCH_NORM,
                axis_name=axis_name, precision=_precision_of(cfg),
                dtype=dtype, min_points=cfg.get("fused_min_points", 20480),
                min_cin=cfg.get("fused_min_cin", 64), name="linear")(
                src_feats_x, nei_inds, weights, additional_features=feat_pe,
                mask=out_mask, train=train)
        else:
            gathered_feat = gfeats[0]  # [M, K, out/4]
            new_feat = jnp.concatenate([gathered_feat, feat_pe], axis=-1)
            new_feat = pconv(new_feat, weights,
                             precision=_precision_of(cfg))  # [M, (out/4+last_ch)*C_mid]

            new_feat = LinearBN(self.out_channel // 2, use_bn=cfg.BATCH_NORM, dtype=dtype,
                                axis_name=axis_name, name="linear")(
                new_feat, mask=out_mask, train=train)
        new_feat = nn.relu(new_feat)
        if cfg.dropout_rate > 0.0:
            new_feat = nn.Dropout(cfg.dropout_rate)(new_feat, deterministic=not train)
        new_feat = UnaryBlock(self.out_channel, use_bn=True, dtype=dtype, no_relu=True,
                              axis_name=axis_name, name="unary2")(
            new_feat, mask=out_mask, train=train)

        # shortcut: max-pooled original features when strided (layers.py:728-737)
        if strided:
            sparse_feats = jnp.max(gfeats[-1], axis=1)
        else:
            sparse_feats = dense_feats
        if self.in_channel != self.out_channel:
            shortcut = UnaryBlock(self.out_channel, use_bn=True, dtype=dtype, no_relu=True,
                                  axis_name=axis_name, name="unary_shortcut")(
                sparse_feats, mask=out_mask, train=train)
        else:
            shortcut = sparse_feats

        new_feat = DropPath(cfg.drop_path_rate)(new_feat, train=train) + shortcut
        new_feat = nn.leaky_relu(new_feat, negative_slope=0.1)
        return new_feat, weightNetInput


class PCFLayer(nn.Module):
    """PointConvFormer layer: conv weights modulated by feature-difference
    guidance (layers.py:194-416)."""

    in_channel: int
    out_channel: int
    cfg: Any
    weightnet: Sequence[int] = (9, 16)
    num_heads: int = 4
    guidance_feat_len: int = 32

    @nn.compact
    def __call__(
        self,
        dense_xyz,
        dense_feats,
        nei_inds,
        dense_xyz_norm=None,
        sparse_xyz=None,
        sparse_xyz_norm=None,
        vi_features=None,
        localized_xyz=None,
        dense_mask=None,
        sparse_mask=None,
        train: bool = False,
    ):
        cfg = as_config(self.cfg)
        dtype = _dtype_of(cfg)
        if dtype is not None:
            dense_feats = dense_feats.astype(dtype)
        strided = sparse_xyz is not None
        center_xyz = sparse_xyz if strided else dense_xyz
        center_norm = sparse_xyz_norm if strided else dense_xyz_norm
        out_mask = sparse_mask if strided else dense_mask
        axis_name = cfg.get("bn_axis_name")
        use_pallas = bool(cfg.get("USE_PALLAS_KERNEL")) and fused_wins(
            cfg, nei_inds.shape[0], self.out_channel // 4,
            self.out_channel // 2)

        # First downscaling mlp
        if self.in_channel != self.out_channel // 4:
            feats_x = UnaryBlock(self.out_channel // 4, use_bn=True, dtype=dtype,
                                 axis_name=axis_name, name="unary1")(
                dense_feats, mask=dense_mask, train=train)
        else:
            feats_x = dense_feats

        # guidance features at low dim, gathered together with everything else
        guidance_x = UnaryBlock(self.guidance_feat_len, use_bn=True, dtype=dtype, no_relu=True,
                                axis_name=axis_name, name="guidance_unary")(
            feats_x, mask=dense_mask, train=train)

        if fused_eval_ok(cfg, self, nei_inds, train):
            res = try_pcf_fused_eval(
                self, cfg, feats_x, guidance_x, dense_feats, dense_xyz,
                dense_xyz_norm, nei_inds, center_xyz, center_norm, strided)
            if res is not None:
                new_feat, sparse_feats = res
                new_feat = UnaryBlock(
                    self.out_channel, use_bn=True, dtype=dtype, no_relu=True,
                    axis_name=axis_name, name="unary2")(
                    new_feat, mask=out_mask, train=train)
                if self.in_channel != self.out_channel:
                    shortcut = UnaryBlock(
                        self.out_channel, use_bn=True, dtype=dtype,
                        no_relu=True, axis_name=axis_name,
                        name="unary_shortcut")(
                        sparse_feats, mask=out_mask, train=train)
                else:
                    shortcut = sparse_feats
                # DropPath is the identity at inference
                new_feat = nn.leaky_relu(new_feat + shortcut,
                                         negative_slope=0.1)
                return new_feat, None

        src_xyz, src_norm, src_feats_x, src_guid, src_dense = _spatial_full(
            cfg, dense_xyz, dense_xyz_norm, feats_x, guidance_x, dense_feats)
        feat_reqs = [src_guid] + ([] if use_pallas else [src_feats_x]) + (
            [src_dense] if strided else [])
        localized_xyz, gathered_norm, gfeats = _gathered_inputs(
            nei_inds, src_xyz, center_xyz, feat_reqs,
            localized_xyz=localized_xyz, dense_xyz_norm=src_norm,
            need_norm=cfg.USE_VI and vi_features is None)
        weightNetInput = _weightnet_input(
            cfg, localized_xyz, gathered_norm, center_norm, vi_features)
        flatK = _flat_k(weightNetInput, nei_inds)

        # lift the 12-d VI coords to the guidance feature length (layers.py:361-362)
        feat_pe = LinearBN(self.guidance_feat_len, use_bn=cfg.BATCH_NORM, dtype=dtype,
                           axis_name=axis_name, flat_k=flatK, name="mlp_conv")(
            weightNetInput, mask=out_mask, train=train)
        feat_pe = nn.relu(feat_pe)
        if flatK:  # the guidance concat below joins the 3-D feature path
            feat_pe = _unfold(feat_pe, flatK)

        gathered_feat2 = gfeats[0]  # [M, K, gfl]
        guidance_feature = jnp.concatenate([gathered_feat2, feat_pe], axis=-1)

        guidance_query = guidance_feature
        if sparse_xyz is None:  # M == N: key = the center itself (layers.py:377-378)
            guidance_key = jnp.broadcast_to(guidance_feature[:, :1, :], guidance_feature.shape)
        else:  # strided: key = max-pool over the neighborhood (layers.py:379-381)
            guidance_key = jnp.broadcast_to(
                jnp.max(guidance_feature, axis=1, keepdims=True), guidance_feature.shape)

        if cfg.attention_type == "subtraction":
            guidance_score = MultiHeadGuidance(
                self.num_heads, 2 * self.guidance_feat_len,
                layer_norm_guidance=cfg.layer_norm_guidance,
                use_bn=cfg.BATCH_NORM, axis_name=axis_name, dtype=dtype,
                name="guidance_weight")(guidance_query, guidance_key,
                                        mask=out_mask, train=train)
        else:
            guidance_score = MultiHeadGuidanceQK(
                self.num_heads, 2 * self.guidance_feat_len, key_dim=16,
                use_bn=cfg.BATCH_NORM, axis_name=axis_name, dtype=dtype,
                name="guidance_weight")(guidance_query, guidance_key,
                                        mask=out_mask, train=train)

        weights = WeightNet(self.weightnet[1], efficient=True,
                            use_bn=cfg.BATCH_NORM, dtype=dtype, axis_name=axis_name,
                            flat_k=flatK,
                            name="weightnet")(weightNetInput, mask=out_mask, train=train)
        if flatK:
            weights = _unfold(weights, flatK)

        # HOT: gather + guidance modulation + K-contraction (layers.py:386-392)
        if use_pallas:
            new_feat = FusedConvLinear(
                self.out_channel // 2, use_bn=cfg.BATCH_NORM,
                axis_name=axis_name, precision=_precision_of(cfg),
                dtype=dtype, min_points=cfg.get("fused_min_points", 20480),
                min_cin=cfg.get("fused_min_cin", 64), name="linear")(
                src_feats_x, nei_inds, weights, guidance=guidance_score,
                mask=out_mask, train=train)
        else:
            gathered_feat = gfeats[1]  # [M, K, out/4]
            new_feat = pconv(guided_contraction(gathered_feat, guidance_score),
                             weights, precision=_precision_of(cfg))

            new_feat = LinearBN(self.out_channel // 2, use_bn=cfg.BATCH_NORM, dtype=dtype,
                                axis_name=axis_name, name="linear")(
                new_feat, mask=out_mask, train=train)
        new_feat = nn.relu(new_feat)
        if cfg.dropout_rate > 0.0:
            new_feat = nn.Dropout(cfg.dropout_rate)(new_feat, deterministic=not train)
        new_feat = UnaryBlock(self.out_channel, use_bn=True, dtype=dtype, no_relu=True,
                              axis_name=axis_name, name="unary2")(
            new_feat, mask=out_mask, train=train)

        if strided:
            sparse_feats = jnp.max(gfeats[-1], axis=1)
        else:
            sparse_feats = dense_feats
        if self.in_channel != self.out_channel:
            shortcut = UnaryBlock(self.out_channel, use_bn=True, dtype=dtype, no_relu=True,
                                  axis_name=axis_name, name="unary_shortcut")(
                sparse_feats, mask=out_mask, train=train)
        else:
            shortcut = sparse_feats

        new_feat = DropPath(cfg.drop_path_rate)(new_feat, train=train) + shortcut
        new_feat = nn.leaky_relu(new_feat, negative_slope=0.1)
        return new_feat, weightNetInput


class PointConvTransposePE(nn.Module):
    """Decoder upsampling conv: puts features from sparse_xyz onto dense_xyz,
    adds the encoder skip, runs mlp2 (layers.py:909-1105)."""

    in_channel: int
    out_channel: int
    cfg: Any
    weightnet: Sequence[int] = (9, 16)
    mlp2: Optional[Sequence[int]] = None

    @nn.compact
    def __call__(
        self,
        sparse_xyz,
        sparse_feats,
        nei_inds,       # [M_dense, K] indices into the sparse level
        sparse_xyz_norm=None,
        dense_xyz=None,
        dense_xyz_norm=None,
        dense_feats=None,
        vi_features=None,
        dense_mask=None,
        sparse_mask=None,
        train: bool = False,
    ):
        cfg = as_config(self.cfg)
        dtype = _dtype_of(cfg)
        if dtype is not None:
            sparse_feats = sparse_feats.astype(dtype)
            if dense_feats is not None:
                dense_feats = dense_feats.astype(dtype)
        axis_name = cfg.get("bn_axis_name")
        out_mask = dense_mask
        pe_w = min(self.out_channel // 4, 32) if cfg.USE_PE else 0
        use_pallas = bool(cfg.get("USE_PALLAS_KERNEL")) and fused_wins(
            cfg, nei_inds.shape[0], sparse_feats.shape[-1] + pe_w,
            self.out_channel)

        if fused_eval_ok(cfg, self, nei_inds, train):
            new_feat = try_transpose_fused_eval(
                self, cfg, sparse_feats, sparse_xyz, sparse_xyz_norm,
                nei_inds, dense_xyz, dense_xyz_norm)
            if dense_feats is not None:  # encoder skip (layers.py:1096-1097)
                new_feat = new_feat + dense_feats
            if self.mlp2:
                for i in range(1, len(self.mlp2)):
                    new_feat = LinearBN(
                        self.mlp2[i], use_bn=cfg.BATCH_NORM, dtype=dtype,
                        axis_name=axis_name, name=f"mlp2_convs_{i-1}")(
                        new_feat, mask=out_mask, train=train)
                    new_feat = nn.relu(new_feat)
            return new_feat, None

        src_xyz, src_norm, src_feats = _spatial_full(
            cfg, sparse_xyz, sparse_xyz_norm, sparse_feats)
        localized_xyz, gathered_norm, gfeats = _gathered_inputs(
            nei_inds, src_xyz, dense_xyz,
            [] if use_pallas else [src_feats],
            dense_xyz_norm=src_norm,
            need_norm=cfg.USE_VI and vi_features is None)
        weightNetInput = _weightnet_input(
            cfg, localized_xyz, gathered_norm, dense_xyz_norm, vi_features)
        # hoisted flat VI can arrive while the in-layer localized gather is
        # 3-D (decoder edges are never stage-hoisted); flat applies to the
        # weightnet branch only
        flatK = _flat_k(weightNetInput, nei_inds)

        feat_pe = None
        if cfg.USE_PE:
            last_ch = min(self.out_channel // 4, 32)
            feat_pe = WeightNet(last_ch, hidden_unit=(self.out_channel // 4,),
                                efficient=True, use_bn=cfg.BATCH_NORM, dtype=dtype,
                                axis_name=axis_name,
                                flat_k=_flat_k(localized_xyz, nei_inds),
                                name="pe_convs")(
                localized_xyz, mask=out_mask, train=train)
            if localized_xyz.ndim == 2:
                feat_pe = _unfold(feat_pe, int(nei_inds.shape[1]))

        weights = WeightNet(self.weightnet[1], efficient=True,
                            use_bn=cfg.BATCH_NORM, dtype=dtype, axis_name=axis_name,
                            flat_k=flatK,
                            name="weightnet")(weightNetInput, mask=out_mask, train=train)
        if flatK:
            weights = _unfold(weights, flatK)

        if use_pallas:
            new_feat = FusedConvLinear(
                self.out_channel, use_bn=cfg.BATCH_NORM,
                axis_name=axis_name, precision=_precision_of(cfg),
                dtype=dtype, min_points=cfg.get("fused_min_points", 20480),
                min_cin=cfg.get("fused_min_cin", 64), name="linear")(
                src_feats, nei_inds, weights, additional_features=feat_pe,
                mask=out_mask, train=train)
        else:
            gathered_feat = gfeats[0]  # [M, K, in_ch]
            if feat_pe is not None:
                gathered_feat = jnp.concatenate([gathered_feat, feat_pe], axis=-1)
            new_feat = pconv(gathered_feat, weights,
                             precision=_precision_of(cfg))
            new_feat = LinearBN(self.out_channel, use_bn=cfg.BATCH_NORM, dtype=dtype,
                                axis_name=axis_name, name="linear")(
                new_feat, mask=out_mask, train=train)
        new_feat = nn.relu(new_feat)

        if dense_feats is not None:  # encoder skip (layers.py:1096-1097)
            new_feat = new_feat + dense_feats

        if cfg.dropout_rate > 0.0:
            new_feat = nn.Dropout(cfg.dropout_rate)(new_feat, deterministic=not train)

        if self.mlp2:
            for i in range(1, len(self.mlp2)):
                new_feat = LinearBN(self.mlp2[i], use_bn=cfg.BATCH_NORM, dtype=dtype,
                                    axis_name=axis_name, name=f"mlp2_convs_{i-1}")(
                    new_feat, mask=out_mask, train=train)
                new_feat = nn.relu(new_feat)

        return new_feat, weightNetInput


class PointTransformerLayer(nn.Module):
    """PointTransformer block, ablation alternative to PCFLayer
    (layers.py:419-539, adapted from POSTECH-CVLab/point-transformer)."""

    in_planes: int
    out_planes: int
    cfg: Any
    share_planes: int = 8

    @nn.compact
    def __call__(
        self,
        xyz,
        feats,
        nei_inds,
        sparse_xyz=None,
        dense_mask=None,
        sparse_mask=None,
        train: bool = False,
    ):
        cfg = as_config(self.cfg)
        dtype = _dtype_of(cfg)
        if dtype is not None:
            feats = feats.astype(dtype)
        axis_name = cfg.get("bn_axis_name")
        mid = self.out_planes
        out_mask = sparse_mask if sparse_xyz is not None else dense_mask
        center_xyz = sparse_xyz if sparse_xyz is not None else xyz

        from pcf_tpu.nn.init import torch_linear_bias, torch_linear_kernel

        def _dense(out, name, x):
            return nn.Dense(out, dtype=dtype, name=name,
                            kernel_init=torch_linear_kernel,
                            bias_init=torch_linear_bias(x.shape[-1]))(x)

        feats_q = _dense(mid, "linear_q", feats)
        feats_k = index_points(_dense(mid, "linear_k", feats), nei_inds)
        feats_v = index_points(_dense(self.out_planes, "linear_v", feats), nei_inds)

        _, dxyz = _localize(xyz, nei_inds, center_xyz)
        # linear_p: Linear_BN(3,3) + ReLU + Linear(3,out) (layers.py:448-452)
        p = LinearBN(3, use_bn=cfg.BATCH_NORM, dtype=dtype, axis_name=axis_name,
                     name="linear_p_0")(dxyz, mask=out_mask, train=train)
        p = nn.relu(p)
        p = _dense(self.out_planes, "linear_p_1", p)

        if sparse_xyz is not None:
            q = index_points(feats_q, nei_inds[:, 0])  # center = nearest neighbor
        else:
            q = feats_q
        M, K = nei_inds.shape
        w = feats_k - q[:, None, :] + p.reshape(M, K, self.out_planes // mid, mid).sum(2)
        from pcf_tpu.nn.norm import MaskedBatchNorm
        if cfg.BATCH_NORM:
            w = MaskedBatchNorm(mid, axis_name=axis_name, name="bn_w")(
                w, mask=out_mask, use_running_average=not train)
        w = nn.relu(w)
        w = LinearBN(mid // self.share_planes, use_bn=cfg.BATCH_NORM, dtype=dtype,
                     axis_name=axis_name, name="linear_w_0")(w, mask=out_mask, train=train)
        w = nn.relu(w)
        w = _dense(self.out_planes // self.share_planes, "linear_w_1", w)
        w = jax.nn.softmax(w, axis=1)

        c = self.out_planes
        s = self.share_planes
        v = (feats_v + p).reshape(M, K, s, c // s)
        new_feats = jnp.sum(v * w[:, :, None, :], axis=1).reshape(M, c)

        if sparse_xyz is not None:
            sparse_feats = jnp.max(index_points(feats, nei_inds), axis=1)
        else:
            sparse_feats = feats
        if self.in_planes != self.out_planes:
            shortcut = UnaryBlock(self.out_planes, use_bn=True, dtype=dtype, no_relu=True,
                                  axis_name=axis_name, name="unary_shortcut")(
                sparse_feats, mask=out_mask, train=train)
        else:
            shortcut = sparse_feats
        return nn.leaky_relu(new_feats + shortcut, negative_slope=0.1)
