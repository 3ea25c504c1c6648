"""Weight-transplant parity vs the reference PyTorch implementation.

For each layer and the full segmentation model: instantiate the reference
torch module (/root/reference/layers.py, model_architecture.py) on CPU,
transplant its weights into the flax module via tests/ref_loader.transplant,
run identical inputs through both, and assert outputs match to f32 tolerance.
This is the direct de-risk of the "mIoU within 0.3 of reference" target —
any numeric divergence between the two model families shows up here, not
after a 300-epoch training run.

Covered: LinearBN/UnaryBlock (eval + train-mode batch stats + running-stat
update), WeightNet, MultiHeadGuidance (+QK), PointConv, PointConvStridePE
(strided & same-resolution), PCFLayer (strided & same-resolution),
PointConvTransposePE, the full PointConvFormer_Segmentation (forward and
input-gradients), and a train-mode full-layer check.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import (
    load_reference,
    randomize_torch_bn,
    to_torch,
    transplant,
)

from pcf_tpu.config import Config, get_default_configs
from pcf_tpu.data import synthetic_scene
from pcf_tpu.data.pyramid import subsample_and_knn

REF_LAYERS, REF_ARCH, REF_UTILS = load_reference()

ATOL_LAYER = 2e-5
ATOL_MODEL = 2e-4


def make_cfg(**overrides) -> Config:
    """One Config drives both sides (it satisfies the reference's EasyDict
    surface); parity requires the stochastic knobs off."""
    num_level = overrides.pop("num_level", 3)
    base_dim = overrides.pop("base_dim", 32)
    cfg = get_default_configs(Config(), num_level=num_level, base_dim=base_dim)
    cfg.update(
        drop_path_rate=0.0, dropout_rate=0.0, dropout_fc=0.0,
        matmul_precision="highest",  # bit-closest contraction vs torch f32
        USE_CUDA_KERNEL=False, PCONV_OPT=False, USE_PALLAS_KERNEL=False,
        scan_resblocks=False,  # per-block module names must mirror torch
        USE_PE=True,
        mid_dim=[4] * num_level,
        grid_size=[0.3 * 2 ** i for i in range(num_level)],
        num_heads=4, guided_level=0, num_classes=13,
        resblocks=[0, 2, 1][:num_level] + [1] * max(0, num_level - 3),
        resblocks_back=[1] * num_level,
        mid_dim_back=4,
    )
    cfg.update(**overrides)
    return cfg


@pytest.fixture(scope="module")
def scene():
    coord, norm, feats, labels = synthetic_scene(1500, extent=6.0, seed=3)
    pl, nf, npg, ns, nl = subsample_and_knn(
        coord, norm, [0.3, 0.6, 1.2], 8, 8, 8, rng=np.random.default_rng(0))
    return dict(points=pl, nei_forward=nf, nei_propagate=npg, nei_self=ns,
                norms=nl, feats=feats)


def assert_close(jax_out, torch_out, atol, name=""):
    ref = torch_out.detach().numpy()
    if ref.ndim == jnp.asarray(jax_out).ndim + 1:
        ref = ref[0]  # strip the reference's dummy batch dim
    got = np.asarray(jax_out, dtype=np.float64)
    err = np.max(np.abs(got - ref.astype(np.float64)))
    assert err < atol, f"{name}: max abs err {err:.3e} >= {atol}"


# ---------------------------------------------------------------- primitives


def test_linear_bn_parity_eval_and_train():
    from pcf_tpu.nn.norm import LinearBN

    torch.manual_seed(0)
    ref = REF_UTILS.Linear_BN(6, 10, bn_ver="1d")
    randomize_torch_bn(ref)
    x = np.random.default_rng(0).normal(size=(40, 6)).astype(np.float32)

    mod = LinearBN(10)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = transplant(ref, variables)

    ref.eval()
    with torch.no_grad():
        ref_eval = ref(to_torch(x))
    assert_close(mod.apply(variables, jnp.asarray(x)), ref_eval, ATOL_LAYER, "eval")

    # train mode: batch statistics + the running-stat update must both match
    ref.train()
    ref_train = ref(to_torch(x))
    out, mutated = mod.apply(variables, jnp.asarray(x), train=True,
                             mutable=["batch_stats"])
    assert_close(out, ref_train, ATOL_LAYER, "train")
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn"]["mean"]),
        ref.bn.running_mean.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(mutated["batch_stats"]["bn"]["var"]),
        ref.bn.running_var.detach().numpy(), atol=1e-6)


def test_unary_block_parity():
    from pcf_tpu.nn.norm import UnaryBlock

    torch.manual_seed(1)
    ref = REF_UTILS.UnaryBlock(8, 12, use_bn=True, bn_momentum=0.1)
    randomize_torch_bn(ref, seed=1)
    x = np.random.default_rng(1).normal(size=(30, 8)).astype(np.float32)

    mod = UnaryBlock(12)
    variables = transplant(ref, mod.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    ref.eval()
    with torch.no_grad():
        expected = ref(to_torch(x))
    assert_close(mod.apply(variables, jnp.asarray(x)), expected, ATOL_LAYER)


def test_weightnet_parity():
    from pcf_tpu.nn.weightnet import WeightNet

    torch.manual_seed(2)
    ref = REF_LAYERS.WeightNet(12, 16, hidden_unit=[8, 8], efficient=True)
    randomize_torch_bn(ref, seed=2)
    x = np.random.default_rng(2).normal(size=(25, 8, 12)).astype(np.float32)

    mod = WeightNet(16, hidden_unit=(8, 8), efficient=True)
    # transplant() must see the WeightNet's own tree, not a `core` wrapper at
    # the root — wrap names the way the layers do (child named "weightnet").
    class Wrap(__import__("flax").linen.Module):
        @__import__("flax").linen.compact
        def __call__(self, x, train=False):
            return WeightNet(16, hidden_unit=(8, 8), efficient=True,
                             name="weightnet")(x, train=train)

    class RefWrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.weightnet = ref

    wrap = Wrap()
    variables = transplant(RefWrap(), wrap.init(jax.random.PRNGKey(0), jnp.asarray(x)))
    ref.eval()
    with torch.no_grad():
        expected = ref(to_torch(x))
    assert_close(wrap.apply(variables, jnp.asarray(x)), expected, ATOL_LAYER)


@pytest.mark.parametrize("attention_type", ["subtraction", "qk"])
def test_guidance_parity(attention_type):
    from pcf_tpu.nn.guidance import MultiHeadGuidance, MultiHeadGuidanceQK

    cfg = make_cfg(attention_type=attention_type)
    torch.manual_seed(3)
    rng = np.random.default_rng(3)
    q = rng.normal(size=(20, 8, 64)).astype(np.float32)
    k = rng.normal(size=(20, 8, 64)).astype(np.float32)

    class RefWrap(torch.nn.Module):
        def __init__(self):
            super().__init__()
            if attention_type == "subtraction":
                self.guidance_weight = REF_LAYERS.MultiHeadGuidance(cfg, 4, 64)
            else:
                self.guidance_weight = REF_LAYERS.MultiHeadGuidanceQK(cfg, 4, 64, key_dim=16)

    import flax.linen as fnn

    class Wrap(fnn.Module):
        @fnn.compact
        def __call__(self, q, k, train=False):
            if attention_type == "subtraction":
                return MultiHeadGuidance(4, 64, name="guidance_weight")(q, k, train=train)
            return MultiHeadGuidanceQK(4, 64, key_dim=16, name="guidance_weight")(
                q, k, train=train)

    refw = RefWrap()
    randomize_torch_bn(refw, seed=3)
    wrap = Wrap()
    variables = transplant(refw, wrap.init(jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(k)))
    refw.eval()
    with torch.no_grad():
        expected = refw.guidance_weight(to_torch(q), to_torch(k))
    assert_close(wrap.apply(variables, jnp.asarray(q), jnp.asarray(k)),
                 expected, ATOL_LAYER)


# -------------------------------------------------------------- model layers


def _transplant_pair(ref_module, flax_module, flax_args, flax_kwargs, seed=0):
    variables = flax_module.init(jax.random.PRNGKey(0), *flax_args, **flax_kwargs)
    randomize_torch_bn(ref_module, seed=seed)
    return transplant(ref_module, variables)


@pytest.mark.parametrize("strided", [False, True])
def test_pointconv_parity(scene, strided):
    from pcf_tpu.nn.layers import PointConv

    cfg = make_cfg()
    torch.manual_seed(4)
    ref = REF_LAYERS.PointConv(6, 32, cfg, weightnet=[12, 4])

    pts, norms = scene["points"], scene["norms"]
    feats = np.concatenate([scene["feats"], pts[0]], axis=1)  # USE_XYZ analog
    if strided:
        args = (pts[0], feats, scene["nei_forward"][0], norms[0], pts[1], norms[1])
    else:
        args = (pts[0], feats, scene["nei_self"][0], norms[0], None, None)

    mod = PointConv(6, 32, cfg, (12, 4))
    jargs = tuple(None if a is None else jnp.asarray(a) for a in args)
    variables = _transplant_pair(ref, mod, jargs, {}, seed=4)

    ref.eval()
    with torch.no_grad():
        targs = tuple(None if a is None else to_torch(a) for a in args)
        expected, expected_wni = ref(*targs)
    out, wni = mod.apply(variables, *jargs)
    assert_close(wni, expected_wni, ATOL_LAYER, "weightNetInput")
    assert_close(out, expected, ATOL_LAYER, "PointConv")


@pytest.mark.parametrize("strided", [False, True])
def test_pointconv_stride_pe_parity(scene, strided):
    from pcf_tpu.nn.layers import PointConvStridePE

    cfg = make_cfg()
    torch.manual_seed(5)
    ref = REF_LAYERS.PointConvStridePE(32, 64, cfg, weightnet=[12, 4])

    pts, norms = scene["points"], scene["norms"]
    rng = np.random.default_rng(5)
    feats = rng.normal(size=(pts[0].shape[0], 32)).astype(np.float32)
    if strided:
        args = (pts[0], feats, scene["nei_forward"][0], norms[0], pts[1], norms[1])
    else:
        args = (pts[0], feats, scene["nei_self"][0], norms[0], None, None)

    mod = PointConvStridePE(32, 64, cfg, (12, 4))
    jargs = tuple(None if a is None else jnp.asarray(a) for a in args)
    variables = _transplant_pair(ref, mod, jargs, {}, seed=5)

    ref.eval()
    with torch.no_grad():
        targs = tuple(None if a is None else to_torch(a) for a in args)
        expected, _ = ref(*targs)
    out, _ = mod.apply(variables, *jargs)
    assert_close(out, expected, ATOL_LAYER, "PointConvStridePE")


@pytest.mark.parametrize("strided,attention_type", [
    (False, "subtraction"), (True, "subtraction"), (True, "qk")])
def test_pcf_layer_parity(scene, strided, attention_type):
    from pcf_tpu.nn.layers import PCFLayer

    cfg = make_cfg(attention_type=attention_type)
    torch.manual_seed(6)
    ref = REF_LAYERS.PCFLayer(32, 64, cfg, weightnet=[12, 4], num_heads=4)

    pts, norms = scene["points"], scene["norms"]
    rng = np.random.default_rng(6)
    feats = rng.normal(size=(pts[0].shape[0], 32)).astype(np.float32)
    if strided:
        args = (pts[0], feats, scene["nei_forward"][0], norms[0], pts[1], norms[1])
    else:
        args = (pts[0], feats, scene["nei_self"][0], norms[0], None, None)

    mod = PCFLayer(32, 64, cfg, (12, 4), num_heads=4)
    jargs = tuple(None if a is None else jnp.asarray(a) for a in args)
    variables = _transplant_pair(ref, mod, jargs, {}, seed=6)

    ref.eval()
    with torch.no_grad():
        targs = tuple(None if a is None else to_torch(a) for a in args)
        expected, _ = ref(*targs)
    out, _ = mod.apply(variables, *jargs)
    assert_close(out, expected, ATOL_LAYER, "PCFLayer")


@pytest.mark.parametrize("strided", [False, True])
def test_point_transformer_layer_parity(scene, strided):
    """The ablation PointTransformerLayer (layers.py:419-539), including the
    Sequential-index rename map (linear_p.2 -> linear_p_1 etc.) and the
    standalone bn_w BatchNorm."""
    from pcf_tpu.nn.layers import PointTransformerLayer

    cfg = make_cfg()
    torch.manual_seed(10)
    ref = REF_LAYERS.PointTransformerLayer(32, 64, share_planes=8)

    pts = scene["points"]
    rng = np.random.default_rng(10)
    feats = rng.normal(size=(pts[0].shape[0], 32)).astype(np.float32)
    if strided:
        nei, sparse = scene["nei_forward"][0], pts[1]
    else:
        nei, sparse = scene["nei_self"][0], None

    mod = PointTransformerLayer(32, 64, cfg, share_planes=8)
    jargs = (jnp.asarray(pts[0]), jnp.asarray(feats), jnp.asarray(nei),
             None if sparse is None else jnp.asarray(sparse))
    variables = _transplant_pair(ref, mod, jargs, {}, seed=10)

    ref.eval()
    with torch.no_grad():
        expected = ref(to_torch(pts[0]), to_torch(feats), to_torch(nei),
                       None if sparse is None else to_torch(sparse))
    out = mod.apply(variables, *jargs)
    assert_close(out, expected, ATOL_LAYER, "PointTransformerLayer")


def test_pointconv_transpose_parity(scene):
    from pcf_tpu.nn.layers import PointConvTransposePE

    cfg = make_cfg()
    torch.manual_seed(7)
    ref = REF_LAYERS.PointConvTransposePE(64, 32, cfg, weightnet=[12, 4], mlp2=[32, 32])

    pts, norms = scene["points"], scene["norms"]
    rng = np.random.default_rng(7)
    sparse_feats = rng.normal(size=(pts[1].shape[0], 64)).astype(np.float32)
    dense_feats = rng.normal(size=(pts[0].shape[0], 32)).astype(np.float32)
    nei = scene["nei_propagate"][0]  # [N0, K] indices into level 1

    mod = PointConvTransposePE(64, 32, cfg, (12, 4), (32, 32))
    jargs = (jnp.asarray(pts[1]), jnp.asarray(sparse_feats), jnp.asarray(nei),
             jnp.asarray(norms[1]), jnp.asarray(pts[0]), jnp.asarray(norms[0]),
             jnp.asarray(dense_feats))
    variables = _transplant_pair(ref, mod, jargs, {}, seed=7)

    ref.eval()
    with torch.no_grad():
        expected, _ = ref(to_torch(pts[1]), to_torch(sparse_feats), to_torch(nei),
                          to_torch(norms[1]), to_torch(pts[0]), to_torch(norms[0]),
                          to_torch(dense_feats))
    out, _ = mod.apply(variables, *jargs)
    assert_close(out, expected, ATOL_LAYER, "PointConvTransposePE")


# ---------------------------------------------------------------- full model


def _full_model_pair(scene, cfg):
    from pcf_tpu.models import PointConvFormer_Segmentation

    torch.manual_seed(8)
    ref = REF_ARCH.PointConvFormer_Segmentation(cfg)

    pts, norms = scene["points"], scene["norms"]
    feats = scene["feats"]
    jargs = (jnp.asarray(feats),
             [jnp.asarray(p) for p in pts],
             [jnp.asarray(e) for e in scene["nei_self"]],
             [jnp.asarray(e) for e in scene["nei_forward"]],
             [jnp.asarray(e) for e in scene["nei_propagate"]],
             [jnp.asarray(n) for n in norms])
    targs = (to_torch(feats),
             [to_torch(p) for p in pts],
             [to_torch(e) for e in scene["nei_self"]],
             [to_torch(e) for e in scene["nei_forward"]],
             [to_torch(e) for e in scene["nei_propagate"]],
             [to_torch(n) for n in norms])

    mod = PointConvFormer_Segmentation(cfg)
    variables = mod.init(jax.random.PRNGKey(0), *jargs)
    randomize_torch_bn(ref, seed=8)
    variables = transplant(ref, variables)
    return ref, mod, variables, jargs, targs


def test_full_segmentation_parity(scene):
    cfg = make_cfg()
    ref, mod, variables, jargs, targs = _full_model_pair(scene, cfg)
    ref.eval()
    with torch.no_grad():
        expected = ref(*targs)
    logits = mod.apply(variables, *jargs)
    assert logits.shape == tuple(expected.shape[1:])
    assert_close(logits, expected, ATOL_MODEL, "segmentation logits")


def test_full_segmentation_grad_parity(scene):
    """d(sum of logits)/d(input features) must match: validates every VJP in
    the chain (gather transpose, contraction, masked BN in eval mode)."""
    cfg = make_cfg()
    ref, mod, variables, jargs, targs = _full_model_pair(scene, cfg)

    ref.eval()
    tfeats = targs[0].clone().requires_grad_(True)
    ref(tfeats, *targs[1:]).sum().backward()
    expected = tfeats.grad

    grad = jax.grad(lambda f: mod.apply(variables, f, *jargs[1:]).sum())(jargs[0])
    assert_close(grad, expected, 5e-4, "d logits / d features")


@pytest.mark.parametrize("name", ["SGD", "Adam", "AdamW"])
def test_optimizer_step_parity(name):
    """Two optimizer steps vs torch on identical params/grads. In particular
    'Adam' must reproduce torch's COUPLED L2 weight decay
    (train_ScanNet_DDP_WarmUP.py:225-241), not decoupled AdamW."""
    from pcf_tpu.config import Config, get_default_training_cfgs
    from pcf_tpu.train.state import make_optimizer

    cfg = get_default_training_cfgs(Config())
    cfg.update(optimizer=name, learning_rate=0.1, decay_rate=0.01,
               adamw_decay=0.05, scheduler="Constant", grad_clip_norm=1e9,
               accum_iter=1)

    rng = np.random.default_rng(11)
    w0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(2)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if name == "SGD":
        topt = torch.optim.SGD([tw], lr=0.1, momentum=0.9)
    elif name == "Adam":
        topt = torch.optim.Adam([tw], lr=0.1, betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=0.01)
    else:
        topt = torch.optim.AdamW([tw], lr=0.1, weight_decay=0.05)
    for g in grads:
        topt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        topt.step()

    tx, _ = make_optimizer(cfg)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    import optax
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               atol=1e-5, err_msg=name)


def test_pcf_layer_train_mode_parity(scene):
    """Train-mode forward: masked batch statistics across a deep layer must
    reproduce torch BN exactly (no padding here; padding masks are covered by
    tests/test_sharding.py and test_layers.py)."""
    from pcf_tpu.nn.layers import PCFLayer

    cfg = make_cfg()
    torch.manual_seed(9)
    ref = REF_LAYERS.PCFLayer(32, 64, cfg, weightnet=[12, 4], num_heads=4)

    pts, norms = scene["points"], scene["norms"]
    rng = np.random.default_rng(9)
    feats = rng.normal(size=(pts[0].shape[0], 32)).astype(np.float32)
    args = (pts[0], feats, scene["nei_forward"][0], norms[0], pts[1], norms[1])

    mod = PCFLayer(32, 64, cfg, (12, 4), num_heads=4)
    jargs = tuple(jnp.asarray(a) for a in args)
    variables = _transplant_pair(ref, mod, jargs, {}, seed=9)

    ref.train()
    expected, _ = ref(*[to_torch(a) for a in args])
    (out, _), _ = mod.apply(variables, *jargs, train=True, mutable=["batch_stats"])
    assert_close(out, expected, 1e-4, "PCFLayer train-mode")
