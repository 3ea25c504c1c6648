"""Layer-level tests: shapes, gradients, and padding-mask invariance.

The masking tests are the TPU-specific correctness core: a padded batch must
produce identical results (on valid rows) to the unpadded batch, including
through BatchNorm statistics.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcf_tpu.config import Config, get_default_configs
from pcf_tpu.nn import (
    LinearBN,
    MaskedBatchNorm,
    MultiHeadGuidance,
    PCFLayer,
    PointConv,
    PointConvStridePE,
    PointConvTransposePE,
    PointTransformerLayer,
    UnaryBlock,
    WeightNet,
)


def _cfg(**kw):
    cfg = get_default_configs(Config(), num_level=2, base_dim=16)
    cfg.update(kw)
    return cfg


def _scene(rng, N=40, M=12, K=8):
    xyz = rng.normal(size=(N, 3)).astype(np.float32)
    nrm = rng.normal(size=(N, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
    feats = rng.normal(size=(N, 6)).astype(np.float32)
    sxyz = xyz[:M]
    snrm = nrm[:M]
    nei = rng.integers(0, N, size=(M, K)).astype(np.int32)
    nei_self = rng.integers(0, N, size=(N, K)).astype(np.int32)
    nei_self[:, 0] = np.arange(N)
    return map(jnp.asarray, (xyz, nrm, feats, sxyz, snrm, nei, nei_self))


def test_masked_bn_matches_torch_semantics(rng):
    """Masked stats over valid rows == plain BN over the unpadded tensor."""
    x = rng.normal(size=(10, 4)).astype(np.float32)
    pad = np.zeros((6, 4), np.float32)
    xp = jnp.asarray(np.concatenate([x, pad]))
    mask = jnp.asarray(np.arange(16) < 10)

    bn = MaskedBatchNorm(4)
    vars0 = bn.init(jax.random.PRNGKey(0), xp, mask)
    y, new_vars = bn.apply(vars0, xp, mask, mutable=["batch_stats"])

    mean = x.mean(0)
    var = x.var(0)
    expect = (x - mean) / np.sqrt(var + 1e-5)
    np.testing.assert_allclose(np.asarray(y)[:10], expect, atol=1e-4)
    # running stats: torch momentum 0.1, unbiased var
    np.testing.assert_allclose(
        np.asarray(new_vars["batch_stats"]["mean"]), 0.1 * mean, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_vars["batch_stats"]["var"]),
        0.9 * 1.0 + 0.1 * x.var(0, ddof=1), atol=1e-5)


def test_masked_bn_padding_invariance(rng):
    """Adding more padding rows must not change valid outputs or stats."""
    x = rng.normal(size=(12, 5)).astype(np.float32)
    bn = MaskedBatchNorm(5)

    def run(pad_rows):
        xp = jnp.asarray(np.concatenate([x, 7.7 * np.ones((pad_rows, 5), np.float32)]))
        mask = jnp.asarray(np.arange(12 + pad_rows) < 12)
        vars0 = bn.init(jax.random.PRNGKey(0), xp, mask)
        y, nv = bn.apply(vars0, xp, mask, mutable=["batch_stats"])
        return np.asarray(y)[:12], np.asarray(nv["batch_stats"]["mean"])

    y1, m1 = run(0)
    y2, m2 = run(20)
    np.testing.assert_allclose(y1, y2, atol=1e-5)
    np.testing.assert_allclose(m1, m2, atol=1e-6)


def test_weightnet_shapes_and_remat(rng):
    x = jnp.asarray(rng.normal(size=(10, 8, 12)).astype(np.float32))
    for efficient in (False, True):
        wn = WeightNet(16, efficient=efficient)
        vs = wn.init(jax.random.PRNGKey(0), x, None, True)
        y = wn.apply(vs, x, None, True, mutable=["batch_stats"])[0]
        assert y.shape == (10, 8, 16)
        assert bool(jnp.all(y >= 0))  # ReLU after last layer (layers.py:163-171)

        # grads flow in training mode
        def loss(p):
            out, _ = wn.apply({**vs, "params": p["params"]}, x, None, True,
                              mutable=["batch_stats"])
            return jnp.sum(out ** 2)

        g = jax.grad(loss)({"params": vs["params"]})
        flat = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in flat)


def test_guidance_outputs_sigmoid_range(rng):
    q = jnp.asarray(rng.normal(size=(9, 8, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(9, 8, 64)).astype(np.float32))
    g = MultiHeadGuidance(num_heads=8, num_hiddens=64)
    vs = g.init(jax.random.PRNGKey(0), q, k, None, True)
    y = g.apply(vs, q, k, None, True, mutable=["batch_stats"])[0]
    assert y.shape == (9, 8, 8)
    assert bool(jnp.all((y >= 0) & (y <= 1)))


@pytest.mark.parametrize("layer_kind", ["pointconv", "stride", "pcf", "transpose", "ptf"])
def test_layer_forward_backward(rng, layer_kind):
    cfg = _cfg(USE_PE=True)
    xyz, nrm, feats, sxyz, snrm, nei, nei_self = _scene(rng)
    key = jax.random.PRNGKey(0)

    if layer_kind == "pointconv":
        layer = PointConv(6, 16, cfg, (12, 4))
        args = (xyz, feats, nei, nrm, sxyz, snrm)
        out_rows = 12
    elif layer_kind == "stride":
        layer = PointConvStridePE(6, 16, cfg, (12, 4))
        args = (xyz, feats, nei, nrm, sxyz, snrm)
        out_rows = 12
    elif layer_kind == "pcf":
        layer = PCFLayer(6, 16, cfg, (12, 4), num_heads=2)
        args = (xyz, feats, nei, nrm, sxyz, snrm)
        out_rows = 12
    elif layer_kind == "transpose":
        # upsample: sparse (12) -> dense (40)
        layer = PointConvTransposePE(6, 16, cfg, (12, 4), mlp2=(16, 16))
        nei_up = jnp.asarray(np.random.default_rng(1).integers(0, 12, size=(40, 8)))
        args = (sxyz, feats[:12], nei_up, snrm, xyz, nrm, None)
        out_rows = 40
    else:
        layer = PointTransformerLayer(6, 16, cfg)
        args = (xyz, feats, nei, sxyz)
        out_rows = 12

    vs = layer.init(key, *args, train=True)
    out = layer.apply(vs, *args, train=True, mutable=["batch_stats"])[0]
    if layer_kind != "ptf":
        out, wni = out
    assert out.shape == (out_rows, 16)
    assert bool(jnp.all(jnp.isfinite(out)))

    def loss(params):
        o = layer.apply({**vs, "params": params}, *args, train=True,
                        mutable=["batch_stats"])[0]
        o = o[0] if layer_kind != "ptf" else o
        return jnp.sum(o ** 2)

    g = jax.grad(loss)(vs["params"])
    assert all(bool(jnp.all(jnp.isfinite(l))) for l in jax.tree_util.tree_leaves(g))


def test_pcflayer_padding_invariance(rng):
    """Valid-row outputs must be identical with and without padding rows."""
    cfg = _cfg()
    N, M, K = 30, 10, 6
    xyz_np = rng.normal(size=(N, 3)).astype(np.float32)
    nrm_np = rng.normal(size=(N, 3)).astype(np.float32)
    feats_np = rng.normal(size=(N, 8)).astype(np.float32)
    nei_np = rng.integers(0, N, size=(M, K)).astype(np.int32)

    layer = PCFLayer(8, 16, cfg, (12, 4), num_heads=2)

    def run(pad_n, pad_m):
        xyz = jnp.asarray(np.concatenate([xyz_np, 50 + np.zeros((pad_n, 3), np.float32)]))
        nrm = jnp.asarray(np.concatenate([nrm_np, np.zeros((pad_n, 3), np.float32)]))
        feats = jnp.asarray(np.concatenate([feats_np, 3.3 * np.ones((pad_n, 8), np.float32)]))
        nei = jnp.asarray(np.concatenate([nei_np, np.zeros((pad_m, K), np.int32)]))
        sxyz = xyz[: M + pad_m]
        snrm = nrm[: M + pad_m]
        dmask = jnp.asarray(np.arange(N + pad_n) < N)
        smask = jnp.asarray(np.arange(M + pad_m) < M)
        vs = layer.init(jax.random.PRNGKey(0), xyz, feats, nei, nrm, sxyz, snrm,
                        dense_mask=dmask, sparse_mask=smask, train=True)
        (out, _), _ = layer.apply(vs, xyz, feats, nei, nrm, sxyz, snrm,
                                  dense_mask=dmask, sparse_mask=smask, train=True,
                                  mutable=["batch_stats"])
        return np.asarray(out)[:M]

    np.testing.assert_allclose(run(0, 0), run(13, 7), atol=2e-4)


def test_unary_block(rng):
    x = jnp.asarray(rng.normal(size=(20, 8)).astype(np.float32))
    ub = UnaryBlock(16)
    vs = ub.init(jax.random.PRNGKey(0), x, None, True)
    y = ub.apply(vs, x, None, True, mutable=["batch_stats"])[0]
    assert y.shape == (20, 16)


def test_torch_default_linear_init():
    """Linears init like torch nn.Linear.reset_parameters (the reference
    never overrides it): U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for kernel AND
    bias — not flax's lecun_normal/zeros."""
    import jax
    import numpy as np

    from pcf_tpu.nn.norm import LinearBN

    fan_in, out = 96, 64
    m = LinearBN(out, use_bn=False)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((512, fan_in)))
    k = np.asarray(v["params"]["c"]["kernel"])
    b = np.asarray(v["params"]["c"]["bias"])
    bound = 1.0 / np.sqrt(fan_in)
    assert np.abs(k).max() <= bound + 1e-6
    assert np.abs(b).max() <= bound + 1e-6
    # uniform, not normal/zeros: std of U(-a,a) is a/sqrt(3)
    assert np.isclose(k.std(), bound / np.sqrt(3), rtol=0.1)
    assert b.std() > 0
