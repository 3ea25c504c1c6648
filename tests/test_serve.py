"""AOT export / serving artifact: roundtrip parity with the live model.

No reference analog (the reference serves by re-importing model code +
torch checkpoint, test_ScanNet_simple.py:108-127); this is the TPU-native
production path: jax.export StableHLO per bucket + flat params, servable
without flax or the model package.
"""

import numpy as np
import pytest

import jax

from pcf_tpu.config import Config, get_default_configs
from pcf_tpu.core import pack_scenes
from pcf_tpu.data import synthetic_scene
from pcf_tpu.data.pyramid import scene_to_item
from pcf_tpu.models import PointConvFormer_Segmentation
from pcf_tpu.serve import ServingModel, export_artifact
from pcf_tpu.serve.export import _batch_args

GRID = [0.3, 0.6, 1.2]


def _cfg(**kw):
    cfg = get_default_configs(Config(), num_level=3, base_dim=8)
    cfg.update(guided_level=0, num_heads=2, resblocks=[0, 1, 1],
               mid_dim=[4, 4, 4], grid_size=GRID, num_classes=5, USE_PE=True,
               K_self=[8] * 3, K_forward=[8] * 3, K_propagate=[8] * 3,
               bucket_multiple=128, ignore_label=-100, manual_seed=0)
    cfg.update(kw)
    return cfg


def _batch(n, seed):
    coord, norm, feats, labels = synthetic_scene(n, extent=4.0, num_classes=5,
                                                 seed=seed)
    item = scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                         rng=np.random.default_rng(seed))
    return pack_scenes([item], bucket_multiple=128)


@pytest.fixture(scope="module")
def exported(tmp_path_factory):
    cfg = _cfg()
    b = _batch(260, 0)
    model = PointConvFormer_Segmentation(cfg)
    vs = model.init(jax.random.PRNGKey(0), *_batch_args(b)[:-1],
                    masks=_batch_args(b)[-1], train=False)
    out = str(tmp_path_factory.mktemp("artifact"))
    meta = export_artifact(cfg, vs, out, [b])
    return cfg, model, vs, b, out, meta


def test_artifact_roundtrip_parity(exported):
    cfg, model, vs, b, out, meta = exported
    assert len(meta["buckets"]) == 1
    serving = ServingModel(out)
    got = np.asarray(serving.predict_packed(b), np.float32)
    want = np.asarray(model.apply(vs, *_batch_args(b)[:-1],
                                  masks=_batch_args(b)[-1], train=False),
                      np.float32)
    mask = np.asarray(b.masks[0])
    np.testing.assert_allclose(got[mask], want[mask], atol=1e-5, rtol=1e-5)


def test_unknown_bucket_rejected(exported):
    _, _, _, _, out, _ = exported
    serving = ServingModel(out)
    big = _batch(2000, 1)  # larger scene -> different bucket caps
    if tuple(int(p.shape[0]) for p in big.points) in serving._fns:
        pytest.skip("bucketing collapsed sizes; no mismatch to test")
    with pytest.raises(KeyError):
        serving.predict_packed(big)


def test_windowed_artifact_roundtrip(tmp_path):
    """window_gather artifacts must export and serve the windowed execution
    strategy (ADVICE r1): the WindowedEdges pytree is part of the traced
    calling convention, meta.json records the window geometry, and
    predict_scene packs with it."""
    from pcf_tpu.ops.window import WindowedEdges

    cfg = _cfg(window_gather=True, window_tile=16, window_size=128)
    coord, norm, feats, labels = synthetic_scene(260, extent=4.0,
                                                 num_classes=5, seed=0)
    item = scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                         rng=np.random.default_rng(0), morton=True)
    b = pack_scenes([item], bucket_multiple=128, window_tile=16,
                    window_size=128)
    assert isinstance(b.edges_self[0], WindowedEdges)

    model = PointConvFormer_Segmentation(cfg)
    vs = model.init(jax.random.PRNGKey(0), *_batch_args(b)[:-1],
                    masks=_batch_args(b)[-1], train=False)
    out = str(tmp_path / "win_artifact")
    meta = export_artifact(cfg, vs, out, [b])
    assert meta["window"] == {"tile": 16, "sizes": None, "size": 128}

    serving = ServingModel(out)
    got = np.asarray(serving.predict_packed(b), np.float32)
    want = np.asarray(model.apply(vs, *_batch_args(b)[:-1],
                                  masks=_batch_args(b)[-1], train=False),
                      np.float32)
    mask = np.asarray(b.masks[0])
    np.testing.assert_allclose(got[mask], want[mask], atol=1e-5, rtol=1e-5)

    coord2, norm2, feats2, _ = synthetic_scene(240, extent=4.0, num_classes=5,
                                               seed=2)
    labels2, probs2 = serving.predict_scene(coord2, norm2, feats2,
                                            rng=np.random.default_rng(3))
    assert labels2.shape == (len(coord2),)
    np.testing.assert_allclose(probs2.sum(-1), 1.0, atol=1e-4)


def test_predict_scene_end_to_end(exported):
    _, _, _, _, out, _ = exported
    serving = ServingModel(out)
    coord, norm, feats, _ = synthetic_scene(240, extent=4.0, num_classes=5,
                                            seed=2)
    labels, probs = serving.predict_scene(coord, norm, feats,
                                          rng=np.random.default_rng(3))
    assert labels.shape == (len(coord),)
    assert probs.shape == (len(coord), 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    assert labels.min() >= 0 and labels.max() < 5
