"""Full segmentation model: PCF backbone + transpose-conv decoder + FC head.

Reference: model_architecture.py:345-502. The decoder walks the pyramid from
the coarsest level back to level 0 with PointConvTransposePE (skip-added
encoder features), optional residual blocks, then fc1(+BN) -> dropout -> fc2.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn

from pcf_tpu.models.backbone import (
    PCF_Backbone,
    _skip_stage_geometry,
    _stage_geometry,
    maybe_remat,
)
from pcf_tpu.nn.layers import PointConvStridePE, PointConvTransposePE
from pcf_tpu.nn.norm import LinearBN
from pcf_tpu.config import as_config


class PointConvFormer_Segmentation(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, features, pointclouds, edges_self, edges_forward,
                 edges_propagate, norms, masks=None, train: bool = False):
        cfg = as_config(self.cfg)
        from pcf_tpu.ops.window import set_resolve_impl
        set_resolve_impl(cfg.get("resolve_impl", "xla"))
        total_level = cfg.num_level
        if masks is None:
            masks = [None] * total_level
        axis_name = cfg.get("bn_axis_name")

        wni_dim = cfg.point_dim + 9 if cfg.USE_VI else cfg.point_dim
        weightnet = (wni_dim, cfg.mid_dim_back)

        feat_list = PCF_Backbone(cfg, name="pcf_backbone")(
            features, pointclouds, edges_self, edges_forward, norms,
            masks=masks, train=train)

        resblocks_back = cfg.get("resblocks_back", [0] * total_level)

        sparse_feat = feat_list[-1]
        for idx, i in enumerate(range(total_level - 2, -1, -1)):
            in_ch = cfg.feat_dim[i + 1]
            out_ch = cfg.base_dim if i == 0 else cfg.feat_dim[i]
            mlp2 = (out_ch, out_ch)

            sparse_feat, _ = maybe_remat(PointConvTransposePE, cfg)(
                in_ch, out_ch, cfg, weightnet, mlp2, name=f"pointdeconv_{idx}")(
                pointclouds[i + 1], sparse_feat, edges_propagate[i],
                norms[i + 1], pointclouds[i], norms[i], feat_list[i],
                None, masks[i], masks[i + 1], train)

            # decoder residual blocks (reference gates on resblocks[i] but
            # counts resblocks_back[i], model_architecture.py:390-398)
            if cfg.resblocks[i] != 0 and resblocks_back[i] > 0:
                if _skip_stage_geometry(cfg, self, edges_self[i], train,
                                        PointConvStridePE):
                    localized, vi_features = None, None
                else:
                    localized, vi_features = _stage_geometry(
                        pointclouds[i], edges_self[i], norms[i],
                        use_vi=cfg.USE_VI, cfg=cfg)
                for j in range(resblocks_back[i]):
                    sparse_feat, _ = maybe_remat(PointConvStridePE, cfg)(
                        out_ch, out_ch, cfg, weightnet,
                        name=f"pointdeconv_res_{idx}_{j}")(
                        pointclouds[i], sparse_feat, edges_self[i], norms[i],
                        None, None, vi_features, localized,
                        masks[i], None, train)

        from pcf_tpu.nn.layers import _dtype_of

        fc = LinearBN(cfg.base_dim, use_bn=cfg.BATCH_NORM, axis_name=axis_name,
                      dtype=_dtype_of(cfg),
                      name="fc1")(sparse_feat, mask=masks[0], train=train)
        fc = nn.relu(fc)
        if cfg.dropout_fc > 0.0:
            fc = nn.Dropout(cfg.dropout_fc)(fc, deterministic=not train)
        from pcf_tpu.nn.init import torch_linear_bias, torch_linear_kernel
        fc = nn.Dense(cfg.num_classes, name="fc2",
                      kernel_init=torch_linear_kernel,
                      bias_init=torch_linear_bias(fc.shape[-1]))(fc)
        return fc
