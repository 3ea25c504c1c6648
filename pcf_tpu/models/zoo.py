"""Model zoo: PCF_Tiny / Small / Normal / Large backbone constructors.

Reference: model_architecture.py:248-342. The variants differ in num_heads,
resblocks per level, WeightNet mid_dim, levels, and grid-size multipliers.
Each returns (flax module, populated cfg) like the reference returns
(nn.Module, cfg).
"""

from __future__ import annotations

from pcf_tpu.config import Config, get_default_configs
from pcf_tpu.models.backbone import PCF_Backbone


def PCF_Tiny(input_grid_size: float, base_dim: int = 64):
    cfg = get_default_configs(Config(), num_level=5, base_dim=base_dim)
    cfg.guided_level = 0
    cfg.num_heads = 1
    cfg.resblocks = [0, 1, 1, 1, 1]
    cfg.mid_dim = [4, 4, 4, 4, 4]
    cfg.grid_size = [input_grid_size * m for m in (1, 2, 4, 8, 16)]
    return PCF_Backbone(cfg), cfg


def PCF_Small(input_grid_size: float, base_dim: int = 64):
    cfg = get_default_configs(Config(), num_level=5, base_dim=base_dim)
    cfg.guided_level = 0
    cfg.num_heads = 8
    cfg.resblocks = [0, 2, 2, 2, 2]
    cfg.mid_dim = [4, 4, 4, 4, 4]
    cfg.grid_size = [input_grid_size * m for m in (1, 2, 4, 8, 16)]
    return PCF_Backbone(cfg), cfg


def PCF_Normal(input_grid_size: float, base_dim: int = 64):
    cfg = get_default_configs(Config(), num_level=5, base_dim=base_dim)
    cfg.guided_level = 0
    cfg.num_heads = 8
    cfg.resblocks = [0, 2, 4, 6, 6]
    cfg.mid_dim = [16, 16, 16, 16, 16]
    cfg.grid_size = [input_grid_size * m for m in (1, 2, 4, 8, 16)]
    return PCF_Backbone(cfg), cfg


def PCF_Large(input_grid_size: float, base_dim: int = 64):
    cfg = get_default_configs(Config(), num_level=6, base_dim=base_dim)
    cfg.guided_level = 0
    cfg.num_heads = 8
    cfg.resblocks = [0, 2, 4, 6, 6, 2]
    cfg.mid_dim = [16, 16, 16, 16, 16, 16]
    cfg.grid_size = [input_grid_size * m for m in (1, 2.5, 5, 10, 20, 40)]
    return PCF_Backbone(cfg), cfg
