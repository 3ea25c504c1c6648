"""Configuration system for pcf_tpu.

YAML-driven config with layered default-fillers, mirroring the reference's
config surface (reference: model_architecture.py:13-77 for model defaults,
train_ScanNet_DDP_WarmUP.py:34-75 for training defaults). The same YAML keys
used by the reference configs (configs/*.yaml) are accepted here.
"""

from __future__ import annotations

import copy
from typing import Any

import yaml


class Config(dict):
    """A dict with attribute access (standalone replacement for easydict)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        try:
            del self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    @classmethod
    def from_dict(cls, d) -> "Config":
        out = cls()
        for k, v in d.items():
            out[k] = cls.from_dict(v) if hasattr(v, "items") else v
        return out

    def copy(self) -> "Config":
        return Config.from_dict(copy.deepcopy(dict(self)))


def as_config(cfg) -> "Config":
    """Rehydrate a Config from any Mapping (flax stores dict module attributes
    as FrozenDicts, which lack attribute access)."""
    return cfg if isinstance(cfg, Config) else Config.from_dict(cfg)


def get_default_configs(cfg: Config, num_level: int = 5, base_dim: int = 64) -> Config:
    """Model-architecture defaults (reference: model_architecture.py:13-77).

    Keys and default values match the reference so its YAML configs drop in.
    TPU-specific keys are added at the end with conservative defaults.
    """
    cfg.num_level = num_level
    cfg.base_dim = base_dim
    if "feat_dim" not in cfg:
        cfg.feat_dim = [base_dim * (i + 1) for i in range(cfg.num_level + 1)]
    # Viewpoint-invariant coordinate transform (Li et al., WACV 2023)
    cfg.setdefault("USE_VI", True)
    # Concatenate positional encoding into features for the first-level conv
    cfg.setdefault("USE_PE", False)
    cfg.setdefault("transformer_type", "PCF")
    # 'subtraction' or QK-style attention in the guidance
    cfg.setdefault("attention_type", "subtraction")
    cfg.setdefault("layer_norm_guidance", False)
    cfg.setdefault("drop_path_rate", 0.0)
    cfg.setdefault("BATCH_NORM", True)
    cfg.setdefault("dropout_rate", 0.0)
    cfg.setdefault("TIME", False)
    cfg.setdefault("USE_XYZ", True)
    cfg.setdefault("point_dim", 3)
    # c_mid of the decoder WeightNets
    cfg.setdefault("mid_dim_back", 1)
    # Full-resolution PointConvs at level 1 (vs a single MLP)
    cfg.setdefault("use_level_1", True)
    # TPU analog of the reference's USE_CUDA_KERNEL / PCONV_OPT flags:
    # select the Pallas fused kernels over the XLA reference einsum path.
    # (reference: model_architecture.py:71-76; layer_utils.py:42-173)
    cfg.setdefault("USE_CUDA_KERNEL", False)   # accepted for YAML parity
    cfg.setdefault("PCONV_OPT", False)         # accepted for YAML parity
    cfg.setdefault("USE_PALLAS_KERNEL", bool(cfg.get("USE_CUDA_KERNEL", False)
                                             or cfg.get("PCONV_OPT", False)))
    cfg.setdefault("dropout_fc", 0.0)
    cfg.setdefault("num_classes", 20)
    # Numerics: compute dtype for matmul-heavy paths ('bfloat16' or 'float32').
    cfg.setdefault("compute_dtype", "float32")
    # MXU precision of the pconv contraction: 'default' = bf16 multiplicands
    # with f32 accumulation (22% faster flagship eval on v5e), 'highest' =
    # 3-pass f32 emulation (bit-closest to the torch reference; what the
    # parity tests pin).
    cfg.setdefault("matmul_precision", "default")
    # Compile repeated residual blocks once via lax.scan over stacked params
    # (pcf_tpu/nn/resstack.py) instead of unrolling; large compile-time win.
    cfg.setdefault("scan_resblocks", True)
    # Windowed dedup gather (ops/window.py): Morton-sort each level in the
    # pipeline and resolve kNN gathers from per-tile dedup windows. Cuts HBM
    # gather transactions ~4x and the training scatter-add ~3x.
    cfg.setdefault("window_gather", False)
    cfg.setdefault("window_tile", 128)
    # None = per-edge-kind defaults (see core/batching.pack_scenes); set an
    # int to force one window size for every edge array.
    cfg.setdefault("window_size", None)
    # (self, forward, propagate) slot counts; None -> derived from the
    # dataset at loader startup (data/scannet.estimate_window_sizes).
    cfg.setdefault("window_sizes", None)
    cfg.setdefault("window_margin", 1.3)
    # Whole-layer inference megakernel (pcf_tpu/attic/eval_kernel.py —
    # retired r5: measured 0.247x on chip, v3 closed as uneconomic): resolve
    # + VI + WeightNet/PE/guidance MLPs (BN folded) + contraction + linear
    # in one Pallas kernel. Inference-only; needs window_gather batches.
    cfg.setdefault("fused_eval", False)
    # Flat-lane stage geometry (r4): hoisted localize -> VI -> WeightNet in
    # k-major [M, K*c] lanes (unpadded) instead of [M, K, c] (lane-padded
    # 8-42x when materialized). Needs window_gather; parity-pinned by
    # tests/test_flatgeom.py.
    cfg.setdefault("flat_geom", False)
    # Window-resolve implementation: "xla" (one-hot einsum — measured
    # 1.5-3.4x faster than the Pallas kernels across C=16..128 on v5e, and
    # extends the windowed path to f32 geometry tables, RESULTS.md r4) or
    # "pallas" (the r6b kernels). Read at trace time by the models.
    cfg.setdefault("resolve_impl", "xla")
    # Channel-major stage geometry (r4): windowed resolve emits [C, M, K]
    # (unpadded minor M*K) and localize/VI run channel-major; one moveaxis
    # back at the stage boundary. Needs window_gather. Parity pinned by
    # tests/test_cmgeom.py; measured on chip r5 and LOSES ~1 ms eval /
    # ~2 ms train (the boundary moveaxis re-materializes the padded form —
    # RESULTS.md r5), so the measured default is off.
    cfg.setdefault("cm_geom", False)
    return cfg


def get_default_training_cfgs(cfg: Config) -> Config:
    """Training/augmentation defaults (reference: train_ScanNet_DDP_WarmUP.py:34-75)."""
    cfg.setdefault("label_smoothing", False)
    cfg.setdefault("accum_iter", 1)
    cfg.setdefault("rotate_aug", True)
    cfg.setdefault("flip_aug", False)
    cfg.setdefault("scale_aug", True)
    cfg.setdefault("transform_aug", False)
    cfg.setdefault("color_aug", True)
    cfg.setdefault("crop", False)
    cfg.setdefault("shuffle_index", True)
    cfg.setdefault("mix3D", False)
    # kNN after batching, on device (reference: knn_post_dataloader_utils.py)
    cfg.setdefault("post_knn", False)
    cfg.setdefault("USE_WEIGHT", True)
    cfg.setdefault("ignore_label", -100)
    cfg.setdefault("optimizer", "AdamW")
    cfg.setdefault("learning_rate", 0.02)
    cfg.setdefault("adamw_decay", 0.05)
    cfg.setdefault("decay_rate", 0.0001)
    cfg.setdefault("gamma", 0.5)
    cfg.setdefault("scheduler", "MultiStepWithWarmup")
    cfg.setdefault("scheduler_update", "step")
    cfg.setdefault("warmup", "linear")
    cfg.setdefault("warmup_epochs", 10)
    cfg.setdefault("warmup_ratio", 1e-5)
    cfg.setdefault("milestones", None)
    cfg.setdefault("total_epoches", 300)
    # Rematerialization of the residual-block bodies in the backward
    # (nn/resstack.py). Measured default (r5 lever sweep,
    # battery_results/train_levers.log): with the xla resolve, recomputing
    # the blocks beats stashing their [M,K,C] intermediates — train 65.6 ->
    # 63.4 ms AND 5.66 -> 1.64 GiB at flagship. remat_layers (all conv
    # layers) measured +10 ms and stays opt-in for the 2cm/Large memory
    # fits; remat_deconv (decoder only) measured +3.7 ms — kept as a knob,
    # off.
    cfg.setdefault("remat_blocks", True)
    cfg.setdefault("remat_layers", False)
    cfg.setdefault("remat_deconv", False)
    cfg.setdefault("grad_clip_norm", 10.0)
    cfg.setdefault("sync_bn", False)
    cfg.setdefault("manual_seed", 1)
    cfg.setdefault("BATCH_SIZE", 8)
    cfg.setdefault("NUM_WORKERS", 0)
    cfg.setdefault("MAX_POINTS_NUM", 550000)
    cfg.setdefault("print_freq", 5)
    cfg.setdefault("eval_freq", 5)
    cfg.setdefault("save_freq", 5)
    cfg.setdefault("use_tensorboard", False)
    # --- TPU-specific batching knobs (no reference analog: static shapes) ---
    # Per-level padded capacities are rounded up to a multiple of this bucket
    # size to bound recompilation (see pcf_tpu/core/batching.py).
    cfg.setdefault("bucket_multiple", 8192)
    # Number of data-parallel shards (mesh size); None = all local devices.
    cfg.setdefault("data_parallel", None)
    return cfg


def load_config(path: str, overrides=None) -> Config:
    """Load a YAML config and fill model+training defaults.

    Mirrors get_parser() in the reference trainer (train_ScanNet_DDP_WarmUP.py:79-104).
    `overrides` is an optional list of "key=value" strings (values parsed as
    YAML) applied after the defaults — the CLI surface for one-off ablations,
    e.g. --set compute_dtype=bfloat16.
    """
    with open(path, "r") as f:
        cfg = Config.from_dict(yaml.safe_load(f))
    cfg = get_default_configs(cfg, cfg.get("num_level", 5), cfg.get("base_dim", 64))
    cfg = get_default_training_cfgs(cfg)
    cfg.config = path
    return apply_overrides(cfg, overrides)


def apply_overrides(cfg: Config, overrides) -> Config:
    """Apply "key=value" strings onto cfg (value parsed with yaml.safe_load).

    Dotted keys assign into nested Configs ("a.b=1" sets cfg.a.b), creating
    intermediate Configs as needed; assigning through a non-mapping fails
    loudly instead of silently writing an unread literal "a.b" entry.
    """
    for kv in overrides or []:
        key, _, raw = kv.partition("=")
        if not _:
            raise ValueError(f"override {kv!r} is not of the form key=value")
        parts = [p.strip() for p in key.strip().split(".")]
        node = cfg
        for p in parts[:-1]:
            child = node.get(p)
            if child is None:
                child = node[p] = Config()
            elif not isinstance(child, dict):
                raise ValueError(
                    f"override {kv!r}: {p!r} is a {type(child).__name__}, "
                    "not a nested config")
            node = child
        node[parts[-1]] = yaml.safe_load(raw)
    return cfg
