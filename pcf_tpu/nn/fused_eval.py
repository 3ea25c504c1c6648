"""Layer-side wiring of the fused whole-layer inference kernel.

Each conv layer (nn/layers.py) calls its `try_*` helper at the top of its
compute: when the gate passes (inference, windowed edges, cfg.fused_eval),
the helper reads the layer's OWN submodule parameters through the flax scope,
folds every Linear+BatchNorm pair into one affine transform (running-stat BN
at inference is a constant scale/shift — the reference does the same fusion
in replace_batchnorm, util/common_util.py:237-247, layer_utils.py:262-270),
and runs the whole hot middle as one Pallas kernel
(pcf_tpu/attic/eval_kernel.fused_layer_eval — retired from the hot tree r5, see its docstring).

The standard path remains the only one taken during init (parameters are
created there, so checkpoints are layout-identical) and during training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pcf_tpu.attic.eval_kernel import fused_layer_eval

_BN_EPS = 1e-5


def fused_eval_ok(cfg, layer, nei_inds, train: bool) -> bool:
    """Gate: inference-only, windowed edges with kernel-compatible tiling,
    no spatial sharding (the fused path would need its own all_gathers)."""
    from pcf_tpu.ops.window import WindowedEdges

    if train or layer.is_initializing() or not cfg.get("fused_eval"):
        return False
    if cfg.get("spatial_axis"):
        return False
    if not isinstance(nei_inds, WindowedEdges):
        return False
    M, K = nei_inds.nei.shape
    MtK = nei_inds.localT.shape[-1]
    T = nei_inds.window_rows.shape[0]
    return K % 8 == 0 and MtK % 128 == 0 and M == T * (MtK // K)


def _fold_linbn(params, stats):
    """LinearBN -> one (w, b): y = (x@w + b - mean)*inv*scale + beta."""
    w = params["c"]["kernel"].astype(jnp.float32)
    b = params["c"]["bias"].astype(jnp.float32)
    if params.get("bn") is not None and stats is not None:
        bn, st = params["bn"], stats["bn"]
        s = bn["scale"].astype(jnp.float32) * jax.lax.rsqrt(
            st["var"].astype(jnp.float32) + _BN_EPS)
        return w * s[None, :], (b - st["mean"].astype(jnp.float32)) * s \
            + bn["bias"].astype(jnp.float32)
    return w, b


def _read(layer, name):
    p = layer.scope.get_variable("params", name)
    # Explicit collection-presence check (a bare except here would silently
    # fold Linear+BN without the running stats on any unexpected error,
    # producing wrong inference outputs instead of raising).
    if layer.scope.has_variable("batch_stats", name):
        s = layer.scope.get_variable("batch_stats", name)
    else:
        s = None
    return p, s


def _fold_weightnet(layer, name):
    """WeightNet 'core' MLP -> list of folded (w, b)."""
    p, s = _read(layer, name)
    core_p, core_s = p["core"], (s or {}).get("core")
    pairs = []
    i = 0
    while f"mlp_convs_{i}" in core_p:
        pairs.append(_fold_linbn(
            core_p[f"mlp_convs_{i}"],
            None if core_s is None else core_s.get(f"mlp_convs_{i}")))
        i += 1
    return pairs


def _fold_linbn_named(layer, name):
    p, s = _read(layer, name)
    return _fold_linbn(p, s)


def _fold_guidance(layer, name="guidance_weight"):
    p, s = _read(layer, name)
    return [_fold_linbn(p["mlp_0"], None if s is None else s.get("mlp_0")),
            _fold_linbn(p["mlp_1"], None if s is None else s.get("mlp_1"))]


def _geo_table(xyz, norms, use_vi):
    if use_vi:
        return jnp.concatenate(
            [xyz.astype(jnp.float32), norms.astype(jnp.float32)], axis=-1)
    return xyz.astype(jnp.float32)


def try_pcf_fused_eval(layer, cfg, feats_x, guidance_x, dense_feats,
                       dense_xyz, norms, nei_inds, center_xyz, center_norm,
                       strided: bool):
    """PCFLayer hot middle -> (new_feat_pre_unary2, shortcut_feats)."""
    if cfg.attention_type != "subtraction" or cfg.layer_norm_guidance:
        return None
    wn = _fold_weightnet(layer, "weightnet")
    pe = [_fold_linbn_named(layer, "mlp_conv")]
    gd = _fold_guidance(layer)
    lw, lb = _fold_linbn_named(layer, "linear")

    parts = [feats_x, guidance_x] + ([dense_feats] if strided else [])
    table = jnp.concatenate(parts, axis=-1)
    geo = _geo_table(dense_xyz, norms, cfg.USE_VI)
    out, short = fused_layer_eval(
        table, geo, nei_inds, center_xyz.astype(jnp.float32),
        None if not cfg.USE_VI else center_norm.astype(jnp.float32),
        wn, pe, gd, lw, lb,
        Cx=feats_x.shape[-1], Cg=guidance_x.shape[-1],
        Cs=dense_feats.shape[-1] if strided else 0,
        use_vi=cfg.USE_VI, pe_on_vi=True, strided=strided,
        num_heads=gd[-1][0].shape[-1], out_dtype=feats_x.dtype)
    return out, (short if strided else dense_feats)


def try_stride_pe_fused_eval(layer, cfg, feats_x, dense_feats, dense_xyz,
                             norms, nei_inds, center_xyz, center_norm,
                             strided: bool):
    """PointConvStridePE hot middle -> (new_feat_pre_unary2, shortcut)."""
    wn = _fold_weightnet(layer, "weightnet")
    pe = _fold_weightnet(layer, "pe_convs")
    lw, lb = _fold_linbn_named(layer, "linear")

    parts = [feats_x] + ([dense_feats] if strided else [])
    table = jnp.concatenate(parts, axis=-1) if strided else feats_x
    geo = _geo_table(dense_xyz, norms, cfg.USE_VI)
    out, short = fused_layer_eval(
        table, geo, nei_inds, center_xyz.astype(jnp.float32),
        None if not cfg.USE_VI else center_norm.astype(jnp.float32),
        wn, pe, [], lw, lb,
        Cx=feats_x.shape[-1], Cg=0,
        Cs=dense_feats.shape[-1] if strided else 0,
        use_vi=cfg.USE_VI, pe_on_vi=False, strided=strided,
        out_dtype=feats_x.dtype)
    return out, (short if strided else dense_feats)


def try_pointconv_fused_eval(layer, cfg, dense_feats, dense_xyz, norms,
                             nei_inds, center_xyz, center_norm, use_vi):
    """PointConv (first conv): contraction over [feats | weightNetInput]."""
    wn = _fold_weightnet(layer, "weightnet")
    lw, lb = _fold_linbn_named(layer, "linear")
    geo = _geo_table(dense_xyz, norms, use_vi)
    out, _ = fused_layer_eval(
        dense_feats, geo, nei_inds, center_xyz.astype(jnp.float32),
        None if not use_vi else center_norm.astype(jnp.float32),
        wn, [], [], lw, lb,
        Cx=dense_feats.shape[-1], use_vi=use_vi,
        concat_wni=bool(cfg.USE_PE), out_dtype=dense_feats.dtype)
    return out


def try_transpose_fused_eval(layer, cfg, sparse_feats, sparse_xyz,
                             sparse_norms, nei_inds, dense_xyz, dense_norm):
    """PointConvTransposePE: upsample conv (skip-add + mlp2 stay outside)."""
    wn = _fold_weightnet(layer, "weightnet")
    pe = _fold_weightnet(layer, "pe_convs") if cfg.USE_PE else []
    lw, lb = _fold_linbn_named(layer, "linear")
    geo = _geo_table(sparse_xyz, sparse_norms, cfg.USE_VI)
    out, _ = fused_layer_eval(
        sparse_feats, geo, nei_inds, dense_xyz.astype(jnp.float32),
        None if not cfg.USE_VI else dense_norm.astype(jnp.float32),
        wn, pe, [], lw, lb,
        Cx=sparse_feats.shape[-1], use_vi=cfg.USE_VI, pe_on_vi=False,
        out_dtype=sparse_feats.dtype)
    return out
