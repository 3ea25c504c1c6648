"""Fused whole-layer inference kernel (pcf_tpu/attic/eval_kernel.py) parity.

Every conv layer's fused-eval path must reproduce the standard XLA path on
the SAME parameters. Ground truth runs f32, where the kernel uses
Precision.HIGHEST throughout — residual differences come only from the
inference BN fold (Linear+BN -> one affine; f32 reassociation ~1e-5 per
linear, amplified through MLP chains to <=5e-3 at layer outputs), the same
transform the reference applies via replace_batchnorm
(util/common_util.py:237-247). The kernel itself is exact: resolving and
contracting with hand-folded affine weights reproduces the plain-jnp math to
1e-6 (established by the harness this test distills).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcf_tpu.config import Config, get_default_configs
from pcf_tpu.ops.window import build_windows
from pcf_tpu.nn.layers import (
    PCFLayer,
    PointConv,
    PointConvStridePE,
    PointConvTransposePE,
)

N, M, K = 256, 128, 8


def _mkcfg(**kw):
    cfg = get_default_configs(Config(), num_level=3, base_dim=8)
    cfg.num_heads = 2
    cfg.mid_dim = [4, 4, 4]
    cfg.USE_PE = True
    cfg.update(kw)
    return cfg


@pytest.fixture(scope="module")
def geom():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(N, 3)).astype(np.float32)
    nv = rng.normal(size=(N, 3))
    nv = (nv / np.linalg.norm(nv, axis=1, keepdims=True)).astype(np.float32)
    d = ((xyz[:, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    nei_self = np.argsort(d, axis=1)[:, :K].astype(np.int32)
    dM = ((xyz[:M, None, :] - xyz[None, :, :]) ** 2).sum(-1)
    nei_fwd = np.argsort(dM, axis=1)[:, :K].astype(np.int32)
    dT = ((xyz[:, None, :] - xyz[None, :M, :]) ** 2).sum(-1)
    nei_up = np.argsort(dT, axis=1)[:, :K].astype(np.int32)
    return {
        "xyz": jnp.asarray(xyz), "norm": jnp.asarray(nv),
        "sxyz": jnp.asarray(xyz[:M]), "snorm": jnp.asarray(nv[:M]),
        "wself": build_windows(nei_self, tile=16, window=128),
        "wfwd": build_windows(nei_fwd, tile=16, window=128),
        "wup": build_windows(nei_up, tile=16, window=128),
        "rng": rng,
    }


def _compare(layer_cls, kwargs, args_fn, geom, n_in, atol=5e-3):
    rng = geom["rng"]
    feats = jnp.asarray(rng.normal(size=(N, n_in)).astype(np.float32))
    l_ref = layer_cls(cfg=_mkcfg(fused_eval=False), **kwargs)
    l_fe = layer_cls(cfg=_mkcfg(fused_eval=True), **kwargs)
    args = args_fn(feats)
    vs = l_ref.init(jax.random.PRNGKey(0), *args, train=False)
    o_ref = l_ref.apply(vs, *args, train=False)
    o_fe = l_fe.apply(vs, *args, train=False)
    a = np.asarray(o_ref[0] if isinstance(o_ref, tuple) else o_ref)
    b = np.asarray(o_fe[0] if isinstance(o_fe, tuple) else o_fe)
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a, b, atol=atol, rtol=1e-2)


def test_pointconv_fused_eval(geom):
    _compare(PointConv, dict(in_channel=7, out_channel=16, weightnet=(12, 4)),
             lambda f: (geom["xyz"], f, geom["wself"], geom["norm"]),
             geom, 7)


def test_stride_pe_residual_fused_eval(geom):
    _compare(PointConvStridePE,
             dict(in_channel=16, out_channel=16, weightnet=(12, 4)),
             lambda f: (geom["xyz"], f, geom["wself"], geom["norm"]),
             geom, 16)


def test_stride_pe_strided_fused_eval(geom):
    _compare(PointConvStridePE,
             dict(in_channel=16, out_channel=32, weightnet=(12, 4)),
             lambda f: (geom["xyz"], f, geom["wfwd"], geom["norm"],
                        geom["sxyz"], geom["snorm"]),
             geom, 16)


def test_pcf_residual_fused_eval(geom):
    _compare(PCFLayer,
             dict(in_channel=16, out_channel=16, weightnet=(12, 4),
                  num_heads=2),
             lambda f: (geom["xyz"], f, geom["wself"], geom["norm"]),
             geom, 16)


def test_pcf_strided_fused_eval(geom):
    _compare(PCFLayer,
             dict(in_channel=16, out_channel=32, weightnet=(12, 4),
                  num_heads=2),
             lambda f: (geom["xyz"], f, geom["wfwd"], geom["norm"],
                        geom["sxyz"], geom["snorm"]),
             geom, 16)


def test_transpose_fused_eval(geom):
    rng = geom["rng"]
    sparse_feats = jnp.asarray(rng.normal(size=(M, 32)).astype(np.float32))
    dense_feats = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    kwargs = dict(in_channel=32, out_channel=16, weightnet=(12, 4),
                  mlp2=(16, 16))
    l_ref = PointConvTransposePE(cfg=_mkcfg(fused_eval=False), **kwargs)
    l_fe = PointConvTransposePE(cfg=_mkcfg(fused_eval=True), **kwargs)
    args = (geom["sxyz"], sparse_feats, geom["wup"], geom["snorm"],
            geom["xyz"], geom["norm"], dense_feats)
    vs = l_ref.init(jax.random.PRNGKey(0), *args, train=False)
    o_ref, _ = l_ref.apply(vs, *args, train=False)
    o_fe, _ = l_fe.apply(vs, *args, train=False)
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_fe),
                               atol=5e-3, rtol=1e-2)


def test_fused_eval_model_parity():
    """Whole segmentation model, fused_eval on vs off, same variables."""
    from pcf_tpu.core import pack_scenes
    from pcf_tpu.data import synthetic_scene
    from pcf_tpu.data.pyramid import scene_to_item
    from pcf_tpu.models import PointConvFormer_Segmentation

    GRID = [0.3, 0.6, 1.2]
    coord, norm, feats, labels = synthetic_scene(250, extent=4.0,
                                                 num_classes=5, seed=3)
    item = scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                         rng=np.random.default_rng(3), morton=True)
    bw = pack_scenes([item], bucket_multiple=128, window_tile=16,
                     window_size=128)
    args = (bw.feats, list(bw.points), list(bw.edges_self),
            list(bw.edges_forward), list(bw.edges_propagate), list(bw.norms))

    def _cfg(**kw):
        cfg = get_default_configs(Config(), num_level=3, base_dim=8)
        cfg.guided_level = 0
        cfg.num_heads = 2
        cfg.resblocks = [0, 1, 1]
        cfg.mid_dim = [4, 4, 4]
        cfg.grid_size = GRID
        cfg.num_classes = 5
        cfg.USE_PE = True
        cfg.update(kw)
        return cfg

    m_ref = PointConvFormer_Segmentation(_cfg(fused_eval=False))
    m_fe = PointConvFormer_Segmentation(_cfg(fused_eval=True))
    vs = m_ref.init(jax.random.PRNGKey(0), *args, masks=list(bw.masks),
                    train=False)
    out_ref = m_ref.apply(vs, *args, masks=list(bw.masks), train=False)
    out_fe = m_fe.apply(vs, *args, masks=list(bw.masks), train=False)
    m = np.asarray(bw.masks[0])
    np.testing.assert_allclose(np.asarray(out_ref)[m], np.asarray(out_fe)[m],
                               atol=1e-2, rtol=1e-2)
