"""Point-cloud classification model: PCF backbone + global pooling head.

The reference exercises this capability in tests_pointconv/test_modelnet10.py
(a PointConv encoder + FC classifier trained on ModelNet10, :307-450). Here
it is a first-class model: encoder levels from PCF_Backbone, masked global
max-pool over the coarsest level, and a 2-layer head.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pcf_tpu.config import as_config
from pcf_tpu.models.backbone import PCF_Backbone
from pcf_tpu.nn.norm import LinearBN


class PointConvFormer_Classification(nn.Module):
    cfg: Any

    @nn.compact
    def __call__(self, features, pointclouds, edges_self, edges_forward,
                 norms, masks=None, bids=None, train: bool = False):
        """Returns [num_clouds, num_classes] logits. With a packed multi-cloud
        batch, `bids` (per-point cloud ids at the coarsest level) segments the
        global pool; otherwise the whole batch is one cloud."""
        cfg = as_config(self.cfg)
        feat_list = PCF_Backbone(cfg, name="pcf_backbone")(
            features, pointclouds, edges_self, edges_forward, norms,
            masks=masks, train=train)
        feats = feat_list[-1]  # [N_top, C]
        mask = masks[-1] if masks is not None else jnp.ones(feats.shape[0], bool)

        neg_inf = jnp.finfo(feats.dtype).min
        if bids is None:
            pooled = jnp.max(jnp.where(mask[:, None], feats, neg_inf), axis=0,
                             keepdims=True)  # [1, C]
        else:
            n_clouds = cfg.get("max_clouds", int(cfg.get("BATCH_SIZE", 8)))
            onehot = (bids[:, None] == jnp.arange(n_clouds)[None, :]) & mask[:, None]
            # segment max-pool: [n_clouds, C]
            pooled = jnp.max(
                jnp.where(onehot[:, :, None], feats[:, None, :], neg_inf),
                axis=0)

        x = LinearBN(cfg.base_dim * 2, use_bn=cfg.BATCH_NORM, name="fc1")(
            pooled, train=train)
        x = nn.relu(x)
        if cfg.dropout_fc > 0.0:
            x = nn.Dropout(cfg.dropout_fc)(x, deterministic=not train)
        from pcf_tpu.nn.init import torch_linear_bias, torch_linear_kernel
        return nn.Dense(cfg.num_classes, name="fc2",
                        kernel_init=torch_linear_kernel,
                        bias_init=torch_linear_bias(x.shape[-1]))(x)
