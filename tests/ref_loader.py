"""Load the reference PyTorch implementation for weight-transplant parity tests.

The reference repo (/root/reference, read-only) imports `timm`, `pcf_cuda`
and `easydict`, none of which exist in this image. Parity tests only exercise
the pure-PyTorch compute paths (USE_CUDA_KERNEL=False, PCONV_OPT=False,
drop_path_rate=0), so minimal stubs suffice:

  * timm.models.layers.DropPath  -> faithful reimplementation (per-sample
    drop + 1/keep scaling) with a `forced` hook for decision-matched parity
  * pcf_cuda                     -> empty module (only the CUDA paths call it)
  * easydict.EasyDict            -> pcf_tpu.config.Config (dict + attr access)

Also provides the generic torch-state_dict -> flax-variables translator used
by every transplant test. The flax module tree was deliberately named after
the reference attribute tree, so translation is mechanical:

  torch key                          flax path
  unary1.mlp.c.weight            ->  params/unary1/mlp/c/kernel (transposed)
  unary1.mlp.bn.weight           ->  params/unary1/mlp/bn/scale
  unary1.mlp.bn.running_mean     ->  batch_stats/unary1/mlp/bn/mean
  weightnet.mlp_convs.0.c.bias   ->  params/weightnet/core/mlp_convs_0/c/bias
  pointconv.0.linear.c.weight    ->  params/pointconv_0/linear/c/kernel
  fc2.weight                     ->  params/fc2/kernel (plain nn.Linear)
"""

from __future__ import annotations

import sys
import types
from typing import Mapping

import numpy as np

REF_PATH = "/root/reference"

# torch WeightNet children live directly on the module (mlp_convs.N); the flax
# WeightNet wraps its MLP in a `core` submodule so nn.remat can be applied.
_WRAPPED_WEIGHTNET_NAMES = {"weightnet", "pe_convs"}

# torch nn.Sequential indices count the parameter-less ReLUs; the flax side
# names only the parameterized blocks (reference PointTransformerLayer:
# linear_p = Sequential(Linear_BN, ReLU, Linear), layers.py:448-452;
# linear_w = Sequential(ReLU, Linear_BN, ReLU, Linear), :455-470).
_RENAMES = {"linear_p_2": "linear_p_1",
            "linear_w_1": "linear_w_0",
            "linear_w_3": "linear_w_1"}


def load_reference():
    """Import (layers, model_architecture, layer_utils) from /root/reference."""
    mod = sys.modules.get("layers")
    if mod is not None and getattr(mod, "__file__", "").startswith(REF_PATH):
        import layer_utils
        import layers
        import model_architecture
        return layers, model_architecture, layer_utils

    import torch

    timm = types.ModuleType("timm")
    timm_models = types.ModuleType("timm.models")
    timm_layers = types.ModuleType("timm.models.layers")

    class DropPath(torch.nn.Module):
        """timm.models.layers.DropPath semantics: one Bernoulli per sample
        along dim 0 (the reference's packed layout has batch dim 1, so the
        whole batch keeps or drops together), kept branches scaled by
        1/keep_prob. `forced` (None | bool) pins the keep decision so parity
        tests can mirror the jax side's recorded draws."""

        def __init__(self, drop_prob: float = 0.0):
            super().__init__()
            self.drop_prob = float(drop_prob)
            self.forced = None

        def forward(self, x):
            if self.drop_prob == 0.0 or not self.training:
                return x
            keep = 1.0 - self.drop_prob
            if self.forced is not None:
                return x / keep if self.forced else torch.zeros_like(x)
            shape = (x.shape[0],) + (1,) * (x.ndim - 1)
            rnd = keep + torch.rand(shape, dtype=x.dtype, device=x.device)
            return x.div(keep) * rnd.floor_()

    timm_layers.DropPath = DropPath
    timm_models.layers = timm_layers
    timm.models = timm_models
    sys.modules.setdefault("timm", timm)
    sys.modules.setdefault("timm.models", timm_models)
    sys.modules.setdefault("timm.models.layers", timm_layers)

    sys.modules.setdefault("pcf_cuda", types.ModuleType("pcf_cuda"))

    easydict = types.ModuleType("easydict")
    from pcf_tpu.config import Config

    easydict.EasyDict = Config
    sys.modules.setdefault("easydict", easydict)

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)
    import layer_utils
    import layers
    import model_architecture
    assert layers.__file__.startswith(REF_PATH)
    return layers, model_architecture, layer_utils


def _merge_indices(tokens):
    """ModuleList indices become name suffixes: ['pointconv','0'] -> 'pointconv_0'."""
    out = []
    for t in tokens:
        if t.isdigit() and out:
            out[-1] = f"{out[-1]}_{t}"
        else:
            out.append(t)
    return out


def translate_key(torch_key: str):
    """torch state_dict key -> (collection, flax path tuple, needs_transpose).

    Returns None for keys with no flax counterpart (num_batches_tracked).
    """
    tokens = torch_key.split(".")
    leaf = tokens[-1]
    if leaf == "num_batches_tracked":
        return None
    parents = _merge_indices(tokens[:-1])
    path = []
    for t in parents:
        path.append(_RENAMES.get(t, t))
        if t in _WRAPPED_WEIGHTNET_NAMES:
            path.append("core")
    owner = path[-1] if path else ""

    if owner == "bn" or owner.startswith("bn_"):
        if leaf == "weight":
            return "params", tuple(path) + ("scale",), False
        if leaf == "bias":
            return "params", tuple(path) + ("bias",), False
        if leaf == "running_mean":
            return "batch_stats", tuple(path) + ("mean",), False
        if leaf == "running_var":
            return "batch_stats", tuple(path) + ("var",), False
        raise KeyError(torch_key)
    if owner.startswith("layer_norm"):
        return "params", tuple(path) + ("scale" if leaf == "weight" else "bias",), False
    # torch nn.Linear (either the `c` inside Linear_BN or a bare Linear)
    if leaf == "weight":
        return "params", tuple(path) + ("kernel",), True
    if leaf == "bias":
        return "params", tuple(path) + ("bias",), False
    raise KeyError(torch_key)


def _to_mutable(tree):
    if isinstance(tree, Mapping):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def transplant(torch_module, variables) -> dict:
    """Copy every weight of a reference torch module into flax `variables`.

    Asserts bijectivity: every torch tensor must land on an existing flax leaf
    of the same shape, and every flax param/batch_stat leaf must be written
    exactly once — so structural drift between the two model trees fails loudly
    instead of silently producing garbage parity numbers.
    """
    import jax.numpy as jnp

    tree = _to_mutable(variables)
    written = set()

    for key, tensor in torch_module.state_dict().items():
        translated = translate_key(key)
        if translated is None:
            continue
        collection, path, transpose = translated
        # .numpy() shares memory with the torch tensor and jnp.asarray is
        # zero-copy on CPU — without the copy, torch's in-place running-stat
        # updates would silently mutate the transplanted JAX arrays.
        value = tensor.detach().cpu().numpy().copy()
        if transpose and value.ndim == 2:
            value = value.T
        node = tree.get(collection)
        assert node is not None, f"{key}: no '{collection}' collection in flax tree"
        walked = [collection]
        for p in path[:-1]:
            assert p in node, f"{key}: missing {'/'.join(walked + [p])}"
            node = node[p]
            walked.append(p)
        leaf = path[-1]
        if leaf not in node and "c" in node and leaf in ("kernel", "bias"):
            node = node["c"]  # bare torch Linear vs flax LinearBN(use_bn=False)
            walked.append("c")
        assert leaf in node, f"{key}: missing {'/'.join(walked + [leaf])}"
        assert node[leaf].shape == value.shape, (
            f"{key} -> {'/'.join(walked + [leaf])}: "
            f"shape {node[leaf].shape} != torch {value.shape}")
        node[leaf] = jnp.asarray(value, dtype=node[leaf].dtype)
        written.add((collection,) + tuple(walked[1:]) + (leaf,))

    unwritten = []

    def _walk(node, prefix):
        if isinstance(node, Mapping):
            for k, v in node.items():
                _walk(v, prefix + (k,))
        elif prefix not in written:
            unwritten.append("/".join(prefix))

    for coll in ("params", "batch_stats"):
        if coll in tree:
            _walk(tree[coll], (coll,))
    assert not unwritten, f"flax leaves not covered by transplant: {unwritten}"
    return tree


def randomize_torch_bn(torch_module, seed: int = 0):
    """Give BN parameters/running-stats non-trivial values so the transplant of
    every piece is actually validated (fresh BN is scale=1/bias=0/mean=0/var=1,
    which would mask translation bugs)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in torch_module.modules():
            if isinstance(m, torch.nn.modules.batchnorm._BatchNorm):
                m.weight.copy_(torch.empty_like(m.weight).uniform_(0.5, 1.5, generator=g))
                m.bias.copy_(torch.empty_like(m.bias).uniform_(-0.2, 0.2, generator=g))
                m.running_mean.copy_(
                    torch.empty_like(m.running_mean).uniform_(-0.1, 0.1, generator=g))
                m.running_var.copy_(
                    torch.empty_like(m.running_var).uniform_(0.7, 1.3, generator=g))


def to_torch(*arrays, batched: bool = True):
    """numpy -> torch tensors with the reference's dummy batch dim."""
    import torch

    out = []
    for a in arrays:
        a = np.asarray(a)
        t = torch.from_numpy(a.astype(np.int64) if a.dtype.kind in "iu" else a)
        out.append(t.unsqueeze(0) if batched else t)
    return out[0] if len(out) == 1 else tuple(out)
