"""PCF encoder backbone.

Reference: model_architecture.py:80-245. A multi-resolution encoder over the
point pyramid: level-1 PointConvs (or a single MLP), then per level a strided
PCFLayer/PointConvStridePE + residual blocks. VI features are computed once
per stage and reused across that stage's residual blocks
(model_architecture.py:221-241).

Inputs are the packed pyramid WITHOUT the dummy batch dim:
  features [N0, C], pointclouds[l] [Nl, 3], edges_self[l] [Nl, K],
  edges_forward[l] [N(l+1), K], norms[l] [Nl, 3], masks[l] [Nl] bool.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from pcf_tpu.nn.layers import (
    PCFLayer,
    PointConv,
    PointConvStridePE,
    PointTransformerLayer,
)
from pcf_tpu.nn.norm import LinearBN
from pcf_tpu.nn.resstack import ResBlockStack
from pcf_tpu.ops.gather import index_points, index_points_multi
from pcf_tpu.ops.window import WindowedEdges
from pcf_tpu.ops.vi_transform import VI_coordinate_transform
from pcf_tpu.config import as_config


def maybe_remat(cls, cfg):
    """cfg.remat_layers: recompute the strided/deconv layer bodies in the
    backward instead of saving their [M,K,C] gather/weight intermediates to
    HBM — the layer-level analog of the `remat_blocks` knob (resstack.py:63),
    needed by the 2cm/PTF2 and PCF_Large configs whose level-0/1 activations
    alone overflow a 16 GiB v5e (reference hits the same wall with
    util/checkpoint.py). `train` sits at call position 11 for every conv
    layer (self = 0, transforms.py lifted-remat convention), so callers must
    pass ALL call args positionally when this knob is on.

    cfg.remat_deconv: remat ONLY the decoder transpose convs — the r5 train
    traffic audit puts the [M,K,C] deconv backward stashes at the top of the
    step's HBM bill (bf16[40960,16,128] slice+copy pairs ~1 GiB,
    battery_results/traffic_train_r5.log), while the encoder strided convs
    that full remat_layers also recomputes measured a net LOSS (+10 ms,
    RESULTS.md r5 remat table). Finer grain, same mechanism.
    """
    if not (cfg.get("remat_layers")
            or (cfg.get("remat_deconv")
                and cls.__name__ == "PointConvTransposePE")):
        return cls
    import inspect

    # derive the static position of `train` from the signature (self = 0)
    # instead of hard-coding it — a reordered parameter would otherwise mark
    # the wrong argument static, far from the edit site
    params = list(inspect.signature(cls.__call__).parameters)
    train_pos = params.index("train")
    return nn.remat(cls, static_argnums=(train_pos,))


def _skip_stage_geometry(cfg, module, nei_inds, train, block_cls=None) -> bool:
    """True when every block of the stage will take the fused-eval kernel
    path (nn/fused_eval.py), which recomputes VI in VMEM from the geometry
    windows — precomputing the [M,K,12]/[M,K,3] stage tensors would only
    materialize unused scan inputs."""
    from pcf_tpu.nn.fused_eval import fused_eval_ok

    if not fused_eval_ok(cfg, module, nei_inds, train):
        return False
    if block_cls is PCFLayer:
        return (cfg.attention_type == "subtraction"
                and not cfg.layer_norm_guidance)
    return True


def _stage_geometry(xyz, nei_inds, norms, use_vi, cfg=None):
    """Per-stage geometry shared by every same-level residual block: the
    localized neighbor offsets and (with USE_VI) the VI features, in ONE
    combined gather. The reference computes VI in the first residual block
    and reuses it (model_architecture.py:221-241); the localized offsets are
    equally loop-invariant, and hoisting them drops one 655k-row gather per
    block (see ops/gather.index_points_multi for why gathers price per row).

    Under spatial sharding (cfg.spatial_axis) xyz/norms arrive as row shards;
    gather sources are all_gathered while centers stay sharded."""
    from pcf_tpu.nn.layers import _dtype_of, _spatial_full

    src_xyz, src_norms = (xyz, norms) if cfg is None else _spatial_full(
        cfg, xyz, norms)
    # Cast the loop-invariant geometry features to the compute dtype HERE so
    # the residual scan broadcasts bf16 operands: casting inside the scan
    # body repeated a [M,K,12] f32->bf16 convert + layout copy per iteration
    # (profiled ~1 ms/block at flagship scale). The blocks' own astype then
    # no-ops. Geometry math itself (localization, VI) stays f32.
    dtype = None if cfg is None else _dtype_of(cfg)
    if (cfg is not None and cfg.get("cm_geom")
            and isinstance(nei_inds, WindowedEdges)):
        # Channel-major stage geometry (r4): the windowed resolve emits
        # [C, M, K] directly (minor dim M*K, unpadded) and the whole
        # localize -> VI chain runs channel-major on full 128-lane vregs;
        # the single moveaxis back to the layers' [M, K, c] convention is
        # the transpose XLA's layout assignment already inserts on the
        # row-major path (the {0,2,1} copies, RESULTS.md r4 audit).
        from pcf_tpu.ops.vi_transform import localize_cm, vi_transform_cm
        from pcf_tpu.ops.window import windowed_take_cm

        if use_vi:
            table = jnp.concatenate([src_xyz, src_norms], axis=-1)
            g6 = jax.lax.stop_gradient(windowed_take_cm(table, nei_inds))
            loc_cm = localize_cm(g6[:3], xyz)
            vi_cm = vi_transform_cm(loc_cm, g6[3:], norms)
            localized = jnp.moveaxis(loc_cm, 0, -1)
            vi = jnp.moveaxis(vi_cm, 0, -1)
            if dtype is not None:
                localized, vi = localized.astype(dtype), vi.astype(dtype)
            return localized, vi
        g3 = jax.lax.stop_gradient(windowed_take_cm(src_xyz, nei_inds))
        localized = jnp.moveaxis(localize_cm(g3, xyz), 0, -1)
        return (localized if dtype is None else localized.astype(dtype)), None
    if (cfg is not None and cfg.get("flat_geom")
            and isinstance(nei_inds, WindowedEdges)):
        # Flat-lane stage geometry (r4): the whole localize -> VI chain in
        # k-major [M, K*c] layout — K*12 = 192 lanes pad 1.33x where the
        # 3-D [M, K, 3/12] forms pad 8-42x (RESULTS.md r3/r4). Geometry is
        # gradient-free data, so the flat window gather needs no VJP.
        from pcf_tpu.ops.vi_transform import (localize_flat, split_geom_flat,
                                              vi_transform_flat)
        from pcf_tpu.ops.window import windowed_take_flat

        if use_vi:
            table = jnp.concatenate([src_xyz, src_norms], axis=-1)
            flat6 = jax.lax.stop_gradient(windowed_take_flat(table, nei_inds))
            gx, gn = split_geom_flat(flat6)
            localized = localize_flat(gx, xyz)
            vi = vi_transform_flat(localized, gn, norms)
            if dtype is not None:
                localized, vi = localized.astype(dtype), vi.astype(dtype)
            return localized, vi
        flat3 = jax.lax.stop_gradient(windowed_take_flat(src_xyz, nei_inds))
        localized = localize_flat(flat3, xyz)
        return (localized if dtype is None else localized.astype(dtype)), None
    if use_vi:
        gx, gn = index_points_multi([src_xyz, src_norms], nei_inds)
        localized = gx - xyz[:, None, :]
        vi = VI_coordinate_transform(localized, gn, norms)
        if dtype is not None:
            localized, vi = localized.astype(dtype), vi.astype(dtype)
        return localized, vi
    localized = index_points(src_xyz, nei_inds) - xyz[:, None, :]
    return (localized if dtype is None else localized.astype(dtype)), None


class PCF_Backbone(nn.Module):
    cfg: Any
    input_feat_dim: int = 3

    @nn.compact
    def __call__(self, features, pointclouds, edges_self, edges_forward, norms,
                 masks=None, train: bool = False):
        cfg = as_config(self.cfg)
        from pcf_tpu.ops.window import set_resolve_impl
        set_resolve_impl(cfg.get("resolve_impl", "xla"))
        total_level = cfg.num_level
        guided_level = cfg.guided_level
        if masks is None:
            masks = [None] * total_level

        wni_dim = cfg.point_dim + 9 if cfg.USE_VI else cfg.point_dim
        in_feat_dim = self.input_feat_dim + 3 if cfg.USE_XYZ else self.input_feat_dim

        pointwise_feat = (
            jnp.concatenate([features, pointclouds[0]], axis=-1)
            if cfg.USE_XYZ else features
        )

        if cfg.use_level_1:
            # full-resolution convs (helpful at 5/10cm, model_architecture.py:114-123)
            # Stage geometry (localized offsets + VI) is computed ONCE for the
            # level-0 neighborhood and shared by the PointConv and its residual
            # blocks — they all use edges_self[0] (model_architecture.py:221-241
            # caches VI the same way; here the f32 geometry gather is shared too).
            if _skip_stage_geometry(cfg, self, edges_self[0], train,
                                    PointConvStridePE):
                localized0, vi_features = None, None
            else:
                localized0, vi_features = _stage_geometry(
                    pointclouds[0], edges_self[0], norms[0],
                    use_vi=cfg.USE_VI, cfg=cfg)
            pointwise_feat, _ = maybe_remat(PointConv, cfg)(
                in_feat_dim, cfg.base_dim, cfg, (wni_dim, cfg.mid_dim[0]),
                name="selfpointconv")(
                pointclouds[0], pointwise_feat, edges_self[0], norms[0],
                None, None, vi_features, localized0, masks[0], None, train)
            if cfg.get("scan_resblocks", True):
                pointwise_feat = ResBlockStack(
                    PointConvStridePE, 2, cfg.base_dim, cfg,
                    (wni_dim, cfg.mid_dim[0]), name="selfpointconv_res")(
                    pointclouds[0], pointwise_feat, edges_self[0], norms[0],
                    vi_features=vi_features if cfg.USE_VI else None,
                    localized_xyz=localized0, mask=masks[0], train=train)
            else:
                for j in (1, 2):
                    pointwise_feat, _ = PointConvStridePE(
                        cfg.base_dim, cfg.base_dim, cfg, (wni_dim, cfg.mid_dim[0]),
                        name=f"selfpointconv_res{j}")(
                        pointclouds[0], pointwise_feat, edges_self[0], norms[0],
                        vi_features=vi_features if cfg.USE_VI else None,
                        localized_xyz=localized0,
                        dense_mask=masks[0], train=train)
        else:
            from pcf_tpu.nn.layers import _dtype_of

            pointwise_feat = nn.relu(
                LinearBN(cfg.base_dim, use_bn=cfg.BATCH_NORM,
                         dtype=_dtype_of(cfg),
                         axis_name=cfg.get("bn_axis_name"), name="selfmlp")(
                    pointwise_feat, mask=masks[0], train=train))

        feat_list = [pointwise_feat]
        for i in range(1, total_level):
            in_ch = cfg.feat_dim[i - 1]
            out_ch = cfg.feat_dim[i]
            weightnet = (wni_dim, cfg.mid_dim[i])

            # strided (downsampling) conv: level i-1 -> i
            if i <= guided_level:
                sparse_feat, _ = maybe_remat(PointConvStridePE, cfg)(
                    in_ch, out_ch, cfg, weightnet, name=f"pointconv_{i-1}")(
                    pointclouds[i - 1], feat_list[-1], edges_forward[i - 1],
                    norms[i - 1], pointclouds[i], norms[i],
                    None, None, masks[i - 1], masks[i], train)
            elif cfg.transformer_type == "PCF":
                sparse_feat, _ = maybe_remat(PCFLayer, cfg)(
                    in_ch, out_ch, cfg, weightnet, cfg.num_heads,
                    name=f"pointconv_{i-1}")(
                    pointclouds[i - 1], feat_list[-1], edges_forward[i - 1],
                    norms[i - 1], pointclouds[i], norms[i],
                    None, None, masks[i - 1], masks[i], train)
            else:
                sparse_feat = maybe_remat(PointTransformerLayer, cfg)(
                    in_ch, out_ch, cfg, cfg.num_heads, name=f"pointconv_{i-1}")(
                    pointclouds[i - 1], feat_list[-1], edges_forward[i - 1],
                    pointclouds[i], masks[i - 1], masks[i], train)

            # residual blocks at level i; VI features computed once per stage
            if cfg.transformer_type != "PCF" and i > guided_level:
                for j in range(cfg.resblocks[i]):
                    sparse_feat = PointTransformerLayer(
                        out_ch, out_ch, cfg, cfg.num_heads,
                        name=f"pointconv_res_{i-1}_{j}")(
                        pointclouds[i], sparse_feat, edges_self[i],
                        dense_mask=masks[i], train=train)
            elif cfg.resblocks[i] > 0:
                block_cls = PointConvStridePE if i <= guided_level else PCFLayer
                if _skip_stage_geometry(cfg, self, edges_self[i], train,
                                        block_cls):
                    localized, vi_features = None, None
                else:
                    localized, vi_features = _stage_geometry(
                        pointclouds[i], edges_self[i], norms[i],
                        use_vi=cfg.USE_VI, cfg=cfg)
                if cfg.get("scan_resblocks", True):
                    sparse_feat = ResBlockStack(
                        block_cls, cfg.resblocks[i], out_ch, cfg, weightnet,
                        cfg.num_heads, name=f"pointconv_res_{i-1}")(
                        pointclouds[i], sparse_feat, edges_self[i], norms[i],
                        vi_features=vi_features, localized_xyz=localized,
                        mask=masks[i], train=train)
                else:
                    for j in range(cfg.resblocks[i]):
                        if block_cls is PCFLayer:
                            block = PCFLayer(out_ch, out_ch, cfg, weightnet,
                                             cfg.num_heads,
                                             name=f"pointconv_res_{i-1}_{j}")
                        else:
                            block = PointConvStridePE(
                                out_ch, out_ch, cfg, weightnet,
                                name=f"pointconv_res_{i-1}_{j}")
                        sparse_feat, _ = block(
                            pointclouds[i], sparse_feat, edges_self[i], norms[i],
                            vi_features=vi_features, localized_xyz=localized,
                            dense_mask=masks[i], train=train)

            feat_list.append(sparse_feat)

        return feat_list
