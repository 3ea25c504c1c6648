"""Gate coverage for cfg.fused_eval (VERDICT r3 weak #6).

The fused_eval_ok gate (nn/fused_eval.py) requires K % 8 == 0,
MtK % 128 == 0 and M == T * (MtK // K) — shape invariants the packed
pipeline must produce, or `fused_eval=True` silently compiles the standard
path everywhere (the round-2 "--pallas on used the kernel zero times"
failure mode). These tests trace the real models at windowed shapes and
assert the kernel actually FIRES, without executing it (the try_* helpers
are stubbed with shape-faithful zeros so tracing stays CPU-cheap).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pcf_tpu.nn.layers as layers_mod
from pcf_tpu.config import Config, get_default_configs
from pcf_tpu.core import pack_scenes
from pcf_tpu.data import synthetic_scene
from pcf_tpu.data.pyramid import scene_to_item
from pcf_tpu.models import PointConvFormer_Segmentation
from pcf_tpu.nn.fused_eval import fused_eval_ok
from pcf_tpu.ops.window import build_windows


@pytest.fixture
def counted(monkeypatch):
    """Stub the four try_* helpers with shape-faithful zeros + counters."""
    fired = {"pcf": 0, "stride": 0, "pointconv": 0, "transpose": 0}

    def _out(nei_inds, o, dtype):
        return jnp.zeros((nei_inds.nei.shape[0], o), dtype)

    def pcf(layer, cfg, feats_x, guidance_x, dense_feats, dense_xyz, norms,
            nei_inds, center_xyz, center_norm, strided):
        fired["pcf"] += 1
        o = _out(nei_inds, layer.out_channel // 2, feats_x.dtype)
        short = (jnp.zeros((nei_inds.nei.shape[0], dense_feats.shape[-1]),
                           feats_x.dtype) if strided else dense_feats)
        return o, short

    def stride(layer, cfg, feats_x, dense_feats, dense_xyz, norms, nei_inds,
               center_xyz, center_norm, strided):
        fired["stride"] += 1
        o = _out(nei_inds, layer.out_channel // 2, feats_x.dtype)
        short = (jnp.zeros((nei_inds.nei.shape[0], dense_feats.shape[-1]),
                           feats_x.dtype) if strided else dense_feats)
        return o, short

    def pointconv(layer, cfg, dense_feats, dense_xyz, norms, nei_inds,
                  center_xyz, center_norm, use_vi):
        fired["pointconv"] += 1
        return _out(nei_inds, layer.out_channel, dense_feats.dtype)

    def transpose(layer, cfg, sparse_feats, sparse_xyz, sparse_norms,
                  nei_inds, dense_xyz, dense_norm):
        fired["transpose"] += 1
        return _out(nei_inds, layer.out_channel, sparse_feats.dtype)

    monkeypatch.setattr(layers_mod, "try_pcf_fused_eval", pcf)
    monkeypatch.setattr(layers_mod, "try_stride_pe_fused_eval", stride)
    monkeypatch.setattr(layers_mod, "try_pointconv_fused_eval", pointconv)
    monkeypatch.setattr(layers_mod, "try_transpose_fused_eval", transpose)
    return fired


def _flagship_like(level0_points, num_levels, grid0, window_sizes,
                   n_scenes=1):
    grid = [grid0 * (2 ** i) for i in range(num_levels)]
    scenes = []
    for i in range(n_scenes):
        coord, norm, feats, labels = synthetic_scene(
            level0_points, extent=6.0, seed=i)
        scenes.append(scene_to_item(coord, norm, feats, labels, grid,
                                    16, 16, 16,
                                    rng=np.random.default_rng(i),
                                    morton=True))
    return grid, pack_scenes(scenes, bucket_multiple=1024,
                             window_tile=128, window_sizes=window_sizes)


def _trace_count(cfg, batch, fired):
    model = PointConvFormer_Segmentation(cfg)
    vs = model.init(jax.random.PRNGKey(0), batch.feats, list(batch.points),
                    list(batch.edges_self), list(batch.edges_forward),
                    list(batch.edges_propagate), list(batch.norms),
                    masks=list(batch.masks), train=False)
    for k in fired:
        fired[k] = 0
    # eval_shape traces the eval program without running anything
    jax.eval_shape(
        lambda v, b: model.apply(v, b.feats, list(b.points),
                                 list(b.edges_self), list(b.edges_forward),
                                 list(b.edges_propagate), list(b.norms),
                                 masks=list(b.masks), train=False),
        vs, batch)
    return dict(fired)


def test_flagship_gate_fires_everywhere(counted):
    """PCF_Normal capacity at 10cm-like density: every conv-layer type must
    take the fused path when cfg.fused_eval is on."""
    grid, batch = _flagship_like(3000, 5, 0.1, (512, 1280, 384))
    cfg = get_default_configs(Config(), num_level=5, base_dim=64)
    cfg.update(guided_level=0, num_heads=8, resblocks=[0, 2, 4, 6, 6],
               mid_dim=[16] * 5, grid_size=grid, num_classes=20,
               USE_PE=True, window_gather=True, fused_eval=True,
               compute_dtype="bfloat16")
    fired = _trace_count(cfg, batch, counted)
    assert fired["pointconv"] >= 1, fired       # level-1 conv
    assert fired["stride"] >= 1, fired          # strided + resblock convs
    assert fired["pcf"] >= 1, fired             # guided layers
    assert fired["transpose"] >= 1, fired       # decoder
    # every conv site in the traced program must have taken the fused path:
    # 1 PointConv + per-level strided + scanned resblock bodies + decoder.
    total = sum(fired.values())
    assert total >= 2 * len(grid), fired


def test_2cm_shapes_pass_gate():
    """The 2cm/PTF2 packed caps (RESULTS.md r3 scale proof) must satisfy the
    gate's shape conditions for every edge kind at every level."""
    cfg = Config(fused_eval=True)
    caps = [122880, 98304, 57344, 24576, 8192]
    rng = np.random.default_rng(0)

    class _L:  # minimal layer stand-in for the gate
        @staticmethod
        def is_initializing():
            return False

    for lvl, m in enumerate(caps):
        for n in {m, caps[max(lvl - 1, 0)]}:
            # spatially-local neighbors (Morton-sorted scans keep per-tile
            # uniques under the window; random edges would overflow it)
            base = (np.arange(m, dtype=np.int64) * n // m)[:, None]
            nei = np.clip(base + rng.integers(-64, 65, size=(m, 16)),
                          0, n - 1).astype(np.int32)
            w = build_windows(nei, tile=128, window=1664, strict=False)
            assert w is not None
            assert fused_eval_ok(cfg, _L, w, train=False), (lvl, m, n)


def test_gate_rejects_plain_edges():
    cfg = Config(fused_eval=True)

    class _L:
        @staticmethod
        def is_initializing():
            return False

    nei = jnp.zeros((256, 16), jnp.int32)
    assert not fused_eval_ok(cfg, _L, nei, train=False)
    # and training always takes the standard path
    w = build_windows(np.zeros((256, 16), np.int32), tile=128, window=128)
    assert not fused_eval_ok(cfg, _L, w, train=True)
