"""End-to-end training-dynamics parity vs the reference torch trainer.

The strongest feasible accuracy proof in a ScanNet-free environment: run the
reference trainer math (train_ScanNet_DDP_WarmUP.py:360-449 — weighted
smoothed CE, loss/accum_iter, backward, clip_grad_norm_(clip) every
micro-iteration, optimizer.step() at accumulation boundaries, scheduler.step()
per iteration) and the pcf_tpu trainer (make_train_step + make_optimizer) on
the SAME tiny synthetic dataset with transplanted initialization and identical
schedules for N steps, and assert the loss trajectories and final parameters
(including BN running stats) track within f32 tolerance.

This composes the pieces test_reference_parity.py pins individually (forward,
input grads, BN running-stat updates, single optimizer steps) into the actual
claim behind the "mIoU within 0.3 of reference" north star: identical data +
identical init => identical training dynamics.

Gradient clipping is deliberately exercised: the clip threshold is set from a
probe step so torch's clip_grad_norm_ fires, covering the per-micro-iteration
partial-sum clipping semantics that optax.MultiSteps gets wrong (see
pcf_tpu/train/state.py torch_grad_accum).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from ref_loader import load_reference, to_torch, transplant
from test_reference_parity import make_cfg

from pcf_tpu.core.batching import pack_scenes
from pcf_tpu.data import synthetic_scene
from pcf_tpu.data.pyramid import subsample_and_knn

REF_LAYERS, REF_ARCH, REF_UTILS = load_reference()

N_STEPS = 20
ITER_PER_EPOCH = 6  # milestones [2,3] epochs -> LR drops at steps 12 and 18
GRID = [0.3, 0.6, 1.2]


def _build_dataset(n_scenes=3, n_points=600):
    """Per-scene pyramids in both layouts: raw numpy lists (torch side) and
    exact-capacity PackedPyramids with no padding (jax side) — identical data."""
    scenes, packed = [], []
    for i in range(n_scenes):
        coord, norm, feats, labels = synthetic_scene(
            n_points, extent=6.0, num_classes=13, seed=100 + i)
        pl, nf, npg, ns, nl = subsample_and_knn(
            coord, norm, GRID, 8, 8, 8, rng=np.random.default_rng(i))
        scene = dict(point_list=pl, surface_normal_list=nl, feature_list=feats,
                     label_list=labels, nei_self_list=ns, nei_forward_list=nf,
                     nei_propagate_list=npg)
        scenes.append(scene)
        caps = [p.shape[0] for p in pl]
        packed.append(pack_scenes([scene], level_caps=caps))
    return scenes, packed


def _torch_args(scene):
    return (to_torch(scene["feature_list"]),
            [to_torch(p) for p in scene["point_list"]],
            [to_torch(e) for e in scene["nei_self_list"]],
            [to_torch(e) for e in scene["nei_forward_list"]],
            [to_torch(e) for e in scene["nei_propagate_list"]],
            [to_torch(n) for n in scene["surface_normal_list"]])


def _make_models(cfg, scenes, packed):
    from pcf_tpu.models import PointConvFormer_Segmentation

    torch.manual_seed(0)
    ref = REF_ARCH.PointConvFormer_Segmentation(cfg)
    mod = PointConvFormer_Segmentation(cfg)
    b = packed[0]
    variables = mod.init(
        jax.random.PRNGKey(0), b.feats, list(b.points), list(b.edges_self),
        list(b.edges_forward), list(b.edges_propagate), list(b.norms),
        masks=list(b.masks), train=False)
    variables = transplant(ref, variables)
    return ref, mod, variables


def _probe_grad_norm(cfg, ref, scene):
    """Grad norm of one reference step, used to pick a clip threshold that
    actually fires (otherwise the clipping semantics go untested)."""
    import copy

    probe = copy.deepcopy(ref)
    probe.train()
    criterion = _torch_criterion(cfg)
    pred = probe(*_torch_args(scene))
    loss = criterion(pred.reshape(-1, cfg.num_classes),
                     torch.from_numpy(np.asarray(scene["label_list"], np.int64)))
    loss.backward()
    total = torch.nn.utils.clip_grad_norm_(probe.parameters(), 1e9)
    return float(total)


def _torch_criterion(cfg):
    import torch.nn as nn

    weight = None
    if cfg.get("USE_WEIGHT") and cfg.get("weights"):
        weight = torch.tensor(cfg.weights).float()
    return nn.CrossEntropyLoss(weight=weight, ignore_index=cfg.ignore_label,
                               label_smoothing=float(cfg.label_smoothing or 0.0))


def _torch_train(cfg, ref, scenes, n_steps):
    """The reference train() loop verbatim (train_ScanNet_DDP_WarmUP.py:
    360-449 minus DDP/metrics): returns per-step losses and clip norms."""
    criterion = _torch_criterion(cfg)
    if cfg.optimizer == "SGD":
        opt = torch.optim.SGD(ref.parameters(), lr=cfg.learning_rate, momentum=0.9)
    elif cfg.optimizer == "Adam":
        opt = torch.optim.Adam(ref.parameters(), lr=cfg.learning_rate,
                               betas=(0.9, 0.999), eps=1e-8,
                               weight_decay=cfg.decay_rate)
    else:
        opt = torch.optim.AdamW(ref.parameters(), lr=cfg.learning_rate,
                                weight_decay=cfg.adamw_decay)
    import sys

    sys.path.insert(0, "/root/reference")
    from util.lr import MultiStepWithWarmup

    sched = MultiStepWithWarmup(
        opt, milestones=[int(m * ITER_PER_EPOCH) for m in cfg.milestones],
        gamma=cfg.gamma, warmup="linear",
        warmup_iters=cfg.warmup_epochs * ITER_PER_EPOCH,
        warmup_ratio=cfg.warmup_ratio)
    accum = cfg.get("accum_iter", 1)
    ref.train()
    losses, clip_norms = [], []
    for i in range(n_steps):
        scene = scenes[i % len(scenes)]
        pred = ref(*_torch_args(scene))
        target = torch.from_numpy(np.asarray(scene["label_list"], np.int64))
        loss = criterion(pred.reshape(-1, cfg.num_classes), target)
        losses.append(float(loss.detach()))
        loss = loss / accum
        loss.backward()
        total = torch.nn.utils.clip_grad_norm_(ref.parameters(), cfg.grad_clip_norm)
        clip_norms.append(float(total))
        if (i + 1) % accum == 0 or (i + 1) == n_steps:
            opt.step()
            opt.zero_grad(set_to_none=True)
        sched.step()
    return losses, clip_norms


def _jax_train(cfg, mod, variables, packed, n_steps):
    from pcf_tpu.parallel import make_train_step
    from pcf_tpu.train.state import create_train_state, make_optimizer

    tx, _ = make_optimizer(cfg, iter_per_epoch=ITER_PER_EPOCH)
    state = create_train_state(variables, tx)
    cw = cfg.weights if cfg.get("USE_WEIGHT") else None
    step = make_train_step(mod, tx, cfg, class_weights=cw)
    losses = []
    rng = jax.random.PRNGKey(0)
    for i in range(n_steps):
        state, metrics = step(state, packed[i % len(packed)], rng)
        losses.append(float(metrics["loss"]))
    return losses, state


@pytest.mark.parametrize("opt_name,accum", [
    ("SGD", 1), ("SGD", 3), ("Adam", 3), ("AdamW", 2),
    ("AdamW", 5),  # the published 2cm/PTF2 config's exact setting
])
def test_accum_clip_step_parity(opt_name, accum):
    """EXACT (1e-6) parity of the optimizer/clip/accumulation/schedule
    recursion vs torch, isolated from model chaos: synthetic gradients, many
    micro-steps, clipping firing on partial accumulations, LR schedule
    advancing per micro-iteration. This is the decisive check that
    torch_grad_accum reproduces train_ScanNet_DDP_WarmUP.py:417-427 —
    clip_grad_norm_ runs on the PARTIAL sum every micro-iteration, the step
    consumes the re-clipped accumulation, and scheduler.step() advances the
    LR each iteration regardless of accumulation boundaries."""
    import sys

    from pcf_tpu.config import Config, get_default_training_cfgs
    from pcf_tpu.train.state import create_train_state, make_optimizer

    sys.path.insert(0, "/root/reference")
    from util.lr import MultiStepWithWarmup

    cfg = get_default_training_cfgs(Config())
    cfg.update(optimizer=opt_name, learning_rate=0.05, decay_rate=0.01,
               adamw_decay=0.05, scheduler="MultiStepWithWarmup",
               milestones=[1, 2], gamma=0.5, warmup_epochs=1,
               warmup_ratio=1e-2, accum_iter=accum, grad_clip_norm=1.0)
    iter_per_epoch = 5
    n_micro = 18

    rng = np.random.default_rng(3)
    w0 = rng.normal(size=(6, 4)).astype(np.float32)
    # grad scale chosen so ||g/accum|| straddles the clip threshold
    grads = [rng.normal(size=(6, 4)).astype(np.float32) * rng.uniform(0.5, 3.0)
             for _ in range(n_micro)]

    # --- torch oracle: the reference loop verbatim
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    if opt_name == "SGD":
        topt = torch.optim.SGD([tw], lr=cfg.learning_rate, momentum=0.9)
    elif opt_name == "Adam":
        topt = torch.optim.Adam([tw], lr=cfg.learning_rate, betas=(0.9, 0.999),
                                eps=1e-8, weight_decay=cfg.decay_rate)
    else:
        topt = torch.optim.AdamW([tw], lr=cfg.learning_rate,
                                 weight_decay=cfg.adamw_decay)
    sched = MultiStepWithWarmup(
        topt, milestones=[m * iter_per_epoch for m in cfg.milestones],
        gamma=cfg.gamma, warmup="linear",
        warmup_iters=cfg.warmup_epochs * iter_per_epoch,
        warmup_ratio=cfg.warmup_ratio)
    clipped = 0
    for i, g in enumerate(grads):
        if tw.grad is None:
            tw.grad = torch.zeros_like(tw)
        tw.grad += torch.from_numpy(g.copy()) / accum   # loss /= accum_iter
        total = torch.nn.utils.clip_grad_norm_([tw], cfg.grad_clip_norm)
        clipped += int(float(total) > cfg.grad_clip_norm)
        if (i + 1) % accum == 0:
            topt.step()
            topt.zero_grad(set_to_none=True)
        sched.step()
    assert clipped > 0, "clip never fired — test misconfigured"

    # --- pcf_tpu
    tx, _ = make_optimizer(cfg, iter_per_epoch=iter_per_epoch)
    params = {"w": jnp.asarray(w0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
    np.testing.assert_allclose(np.asarray(params["w"]), tw.detach().numpy(),
                               atol=1e-6, err_msg=f"{opt_name} accum={accum}")


CASES = [
    # (optimizer, accum_iter, USE_WEIGHT+smoothing)
    ("SGD", 1, False),
    ("Adam", 1, True),
    ("SGD", 2, False),
    ("Adam", 2, True),
]


@pytest.mark.parametrize("opt_name,accum,weighted", CASES)
def test_training_dynamics_parity(opt_name, accum, weighted):
    from pcf_tpu.config import get_default_training_cfgs

    cfg = get_default_training_cfgs(make_cfg())
    rngw = np.random.default_rng(7)
    cfg.update(
        optimizer=opt_name,
        learning_rate=0.02 if opt_name == "SGD" else 2e-3,
        decay_rate=1e-4, adamw_decay=0.05,
        scheduler="MultiStepWithWarmup", milestones=[2, 3], gamma=0.3,
        warmup_epochs=1, warmup_ratio=1e-3,
        accum_iter=accum,
        USE_WEIGHT=weighted,
        label_smoothing=0.1 if weighted else 0.0,
        weights=[float(w) for w in rngw.uniform(0.5, 2.0, 13)] if weighted else None,
    )
    scenes, packed = _build_dataset()
    ref, mod, variables = _make_models(cfg, scenes, packed)

    # pick a clip threshold below the observed first-step grad norm so the
    # per-micro-iteration clipping path is genuinely exercised
    g0 = _probe_grad_norm(cfg, ref, scenes[0])
    cfg.grad_clip_norm = 0.7 * g0

    ref_losses, clip_norms = _torch_train(cfg, ref, scenes, N_STEPS)
    assert max(clip_norms) > cfg.grad_clip_norm, "clipping never fired — test misconfigured"

    jax_losses, state = _jax_train(cfg, mod, variables, packed, N_STEPS)

    # Per-step agreement. The first steps are the semantically sharp ones —
    # any clip/LR/accum bug shows up immediately and large; later steps only
    # bound the chaotic f32 drift (measured growth is geometric from ~1e-7,
    # the signature of float-rounding amplification, not of a semantic bug).
    diffs = [abs(a - b) for a, b in zip(ref_losses, jax_losses)]
    detail = f"torch: {ref_losses}\njax:   {jax_losses}"
    for i, d in enumerate(diffs):
        atol = 1e-3 if i < 6 else 6e-2
        assert d < atol, (
            f"step {i}: diff {d:.2e} >= {atol:.0e}\n{detail}")
    assert float(np.mean(diffs)) < 2e-2, f"mean loss diff too large\n{detail}"

    # Final parameters + BN running stats must match leaf-for-leaf. Bounds
    # are drift-sized (chaotic f32 amplification over 20 steps at clipping-
    # active LR); the EXACT semantic discrimination lives in
    # test_accum_clip_step_parity (1e-6, no model chaos). A real clip/LR/
    # accum bug moves parameters onto different trajectories entirely
    # (observed: >10x these bounds when seeded deliberately).
    final_ref = transplant(ref, {"params": state.params,
                                 "batch_stats": state.batch_stats})
    for coll, ours in (("params", state.params), ("batch_stats", state.batch_stats)):
        flat_ref = jax.tree_util.tree_leaves_with_path(final_ref[coll])
        flat_ours = dict(jax.tree_util.tree_leaves_with_path(ours))
        for path, leaf in flat_ref:
            diff = float(jnp.max(jnp.abs(flat_ours[path] - leaf)))
            scale = float(jnp.max(jnp.abs(leaf))) + 1e-8
            assert diff < 1e-2 + 0.25 * scale, (
                f"{coll}{jax.tree_util.keystr(path)}: max abs diff {diff:.2e} "
                f"(leaf scale {scale:.2e})")


def _capture_droppath_decisions(mod, variables, batch, rng):
    """One train-mode forward with intermediates mutable: returns
    {flax module path tuple: keep decision} for every DropPath call. flax
    derives the per-module dropout rng from (key, module path) only, so the
    decisions here are exactly what make_train_step's forward will draw
    with the same rng."""
    import flax

    _, aux = mod.apply(
        variables, batch.feats, list(batch.points), list(batch.edges_self),
        list(batch.edges_forward), list(batch.edges_propagate),
        list(batch.norms), masks=list(batch.masks), train=True,
        rngs={"dropout": rng}, mutable=["batch_stats", "intermediates"])
    flat = flax.traverse_util.flatten_dict(aux["intermediates"])
    out = {}
    for key, value in flat.items():
        assert key[-2].startswith("DropPath") and key[-1] == "keep", key
        (mask,) = value
        out[key[:-2]] = bool(mask)
    return out


def _force_torch_droppath(ref, decisions):
    """Pin every torch DropPath stub to the jax side's recorded decision
    (matched by module path; the flax tree is named after the torch tree)."""
    from ref_loader import _merge_indices

    matched = set()
    for name, mod in ref.named_modules():
        if type(mod).__name__ == "DropPath" and hasattr(mod, "forced"):
            parent = name.rsplit(".", 1)[0]  # strip trailing '.drop_path'
            key = tuple(_merge_indices(parent.split(".")))
            if key not in decisions:
                # PointConvTransposePE constructs self.drop_path but never
                # applies it (reference layers.py:951-952, no call site in
                # :1000-1105) — a dead module with no flax counterpart.
                assert key[-1].startswith("pointdeconv"), key
                continue
            mod.forced = decisions[key]
            matched.add(key)
    assert matched == set(decisions), (sorted(matched), sorted(decisions))


def test_droppath_dynamics_parity():
    """Training-dynamics parity at the shipped 2cm/PTF2 drop_path_rate=0.2
    (configs/configPCF_2cm_PTF2.yaml:49): the reference's timm DropPath on
    the packed [1, SUM_N, C] layout drops each residual branch for the whole
    batch at once (layers.py:237-238,414,739); the rebuild must reproduce
    that per-layer whole-batch semantics, 1/keep scaling included. Decision
    randomness is equalized by recording the jax side's Bernoulli draws and
    pinning the torch stubs to them; everything else is the standard
    dynamics-parity machinery."""
    from pcf_tpu.config import get_default_training_cfgs
    from pcf_tpu.parallel import make_train_step
    from pcf_tpu.train.state import create_train_state, make_optimizer

    cfg = get_default_training_cfgs(make_cfg())
    cfg.update(
        optimizer="SGD", learning_rate=0.02, decay_rate=1e-4,
        scheduler="MultiStepWithWarmup", milestones=[2, 3], gamma=0.3,
        warmup_epochs=1, warmup_ratio=1e-3, accum_iter=1,
        drop_path_rate=0.2,
    )
    scenes, packed = _build_dataset()
    ref, mod, variables = _make_models(cfg, scenes, packed)
    g0 = _probe_grad_norm(cfg, ref, scenes[0])
    cfg.grad_clip_norm = 0.7 * g0

    n_steps = 12
    rng = jax.random.PRNGKey(11)
    step_rngs = [jax.random.fold_in(rng, i) for i in range(n_steps)]
    decisions = [_capture_droppath_decisions(
        mod, variables, packed[i % len(packed)], step_rngs[i])
        for i in range(n_steps)]
    # the test only discriminates if both branches actually occur
    flat = [d for step in decisions for d in step.values()]
    assert any(flat) and not all(flat), (
        f"degenerate decision draw (keeps: {sum(flat)}/{len(flat)}) — "
        "change the seed")

    # --- torch: the reference loop with pinned drop decisions
    import sys

    sys.path.insert(0, "/root/reference")
    from util.lr import MultiStepWithWarmup

    criterion = _torch_criterion(cfg)
    opt = torch.optim.SGD(ref.parameters(), lr=cfg.learning_rate, momentum=0.9)
    sched = MultiStepWithWarmup(
        opt, milestones=[int(m * ITER_PER_EPOCH) for m in cfg.milestones],
        gamma=cfg.gamma, warmup="linear",
        warmup_iters=cfg.warmup_epochs * ITER_PER_EPOCH,
        warmup_ratio=cfg.warmup_ratio)
    ref.train()
    ref_losses = []
    for i in range(n_steps):
        scene = scenes[i % len(scenes)]
        _force_torch_droppath(ref, decisions[i])
        pred = ref(*_torch_args(scene))
        target = torch.from_numpy(np.asarray(scene["label_list"], np.int64))
        loss = criterion(pred.reshape(-1, cfg.num_classes), target)
        ref_losses.append(float(loss.detach()))
        loss.backward()
        torch.nn.utils.clip_grad_norm_(ref.parameters(), cfg.grad_clip_norm)
        opt.step()
        opt.zero_grad(set_to_none=True)
        sched.step()

    # --- pcf_tpu: the production train step, fed the same per-step rngs
    tx, _ = make_optimizer(cfg, iter_per_epoch=ITER_PER_EPOCH)
    state = create_train_state(variables, tx)
    step = make_train_step(mod, tx, cfg)
    jax_losses = []
    for i in range(n_steps):
        state, metrics = step(state, packed[i % len(packed)], step_rngs[i])
        jax_losses.append(float(metrics["loss"]))

    diffs = [abs(a - b) for a, b in zip(ref_losses, jax_losses)]
    detail = f"torch: {ref_losses}\njax:   {jax_losses}\nkeeps: {flat}"
    for i, d in enumerate(diffs):
        # whole-branch drops amplify the chaotic f32 drift faster than the
        # rate-0 dynamics test (measured: 1e-6 at steps 0-2, 1.6e-3 by step
        # 5); the first steps still pin the semantics exactly
        atol = 1e-3 if i < 4 else (8e-3 if i < 8 else 6e-2)
        assert d < atol, f"step {i}: diff {d:.2e} >= {atol:.0e}\n{detail}"
