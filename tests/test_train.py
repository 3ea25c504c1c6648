"""Training-stack tests: loss vs torch oracle, metrics oracle, LR schedules,
and a loss-goes-down smoke train (the reference's only accuracy-level check is
the ModelNet10 script, tests_pointconv/test_modelnet10.py — this is the same
idea at pytest scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pcf_tpu.config import Config, get_default_configs, get_default_training_cfgs
from pcf_tpu.train import lr as lr_mod
from pcf_tpu.train.loss import cross_entropy_loss
from pcf_tpu.train.metrics import intersection_and_union
from pcf_tpu.train.state import create_train_state, make_optimizer


def test_cross_entropy_matches_torch(rng):
    """Parity with torch CrossEntropyLoss(weight, ignore_index, label_smoothing)
    (the reference criterion, train_ScanNet_DDP_WarmUP.py:198-222)."""
    torch = pytest.importorskip("torch")
    N, C = 64, 7
    logits = rng.normal(size=(N, C)).astype(np.float32)
    labels = rng.integers(0, C, size=(N,)).astype(np.int64)
    labels[:7] = -100
    weights = rng.uniform(0.5, 2.0, size=(C,)).astype(np.float32)

    for smoothing in (0.0, 0.2):
        got, _ = cross_entropy_loss(
            jnp.asarray(logits), jnp.asarray(labels),
            class_weights=jnp.asarray(weights),
            label_smoothing=smoothing, ignore_label=-100)
        want = torch.nn.CrossEntropyLoss(
            weight=torch.tensor(weights), ignore_index=-100,
            label_smoothing=smoothing)(
            torch.tensor(logits), torch.tensor(labels)).item()
        assert abs(float(got) - want) < 2e-3, (smoothing, float(got), want)


def test_cross_entropy_mask_excludes_padding(rng):
    logits = rng.normal(size=(20, 4)).astype(np.float32)
    labels = rng.integers(0, 4, size=(20,))
    mask = np.arange(20) < 12
    full, _ = cross_entropy_loss(jnp.asarray(logits[:12]), jnp.asarray(labels[:12]))
    masked, cnt = cross_entropy_loss(jnp.asarray(logits), jnp.asarray(labels),
                                     mask=jnp.asarray(mask))
    assert int(cnt) == 12
    np.testing.assert_allclose(float(full), float(masked), atol=1e-6)


def test_intersection_and_union_oracle(rng):
    """Histogram IoU vs the reference's numpy formulation (common_util.py:56-70)."""
    N, C = 200, 6
    pred = rng.integers(0, C, size=(N,))
    target = rng.integers(0, C, size=(N,))
    target[:17] = -100

    inter, union, tcount = intersection_and_union(
        jnp.asarray(pred), jnp.asarray(target), C)
    # oracle
    valid = target != -100
    p, t = pred[valid], target[valid]
    o_inter = np.histogram(p[p == t], bins=np.arange(C + 1))[0]
    o_p = np.histogram(p, bins=np.arange(C + 1))[0]
    o_t = np.histogram(t, bins=np.arange(C + 1))[0]
    np.testing.assert_array_equal(np.asarray(inter), o_inter)
    np.testing.assert_array_equal(np.asarray(union), o_p + o_t - o_inter)
    np.testing.assert_array_equal(np.asarray(tcount), o_t)


def test_multistep_warmup_schedule():
    """Reference formula (util/lr.py:48-65): linear warmup then gamma decay
    at milestones."""
    sch = lr_mod.multistep_with_warmup(1.0, [100, 200], gamma=0.5,
                                       warmup_iters=10, warmup_ratio=0.1)
    assert float(sch(0)) == pytest.approx(0.1)          # 1-(1-0)*(1-0.1)
    assert float(sch(10)) == pytest.approx(1.0)
    assert float(sch(50)) == pytest.approx(1.0)
    assert float(sch(150)) == pytest.approx(0.5)
    assert float(sch(250)) == pytest.approx(0.25)


def test_cosine_warmup_restarts_schedule():
    """Reference formula (util/lr.py:168-177)."""
    sch = lr_mod.cosine_annealing_warmup_restarts(
        first_cycle_steps=100, max_lr=1.0, min_lr=0.0, warmup_steps=10)
    assert float(sch(0)) == pytest.approx(0.0)
    assert float(sch(10)) == pytest.approx(1.0)
    assert float(sch(55)) == pytest.approx(0.5, abs=1e-6)  # halfway through cosine
    assert float(sch(99)) < 0.01
    # restart
    assert float(sch(105)) == pytest.approx(0.5, abs=1e-6)


@pytest.mark.parametrize("cycle_mult,gamma", [(1.0, 1.0), (1.0, 0.5), (2.0, 0.7)])
def test_cosine_warmup_restarts_torch_oracle(cycle_mult, gamma):
    """Full-generality parity vs the reference class (util/lr.py:121-207):
    cycle_mult != 1 grows cycle lengths, gamma decays the per-cycle peak.
    Oracle = LR the torch scheduler exposes at iteration i (i.e. after i
    step() calls — the trainer steps per-iteration)."""
    torch = pytest.importorskip("torch")
    import sys

    sys.path.insert(0, "/root/reference")
    from util.lr import CosineAnnealingWarmupRestarts

    first, warmup = 40, 8
    # enough steps for 3+ cycles even with cycle_mult=2 (40+72+136=248)
    n_steps = 260
    opt = torch.optim.SGD([torch.nn.Parameter(torch.zeros(1))], lr=0.5)
    ref = CosineAnnealingWarmupRestarts(
        opt, first_cycle_steps=first, cycle_mult=cycle_mult, max_lr=0.5,
        min_lr=1e-3, warmup_steps=warmup, gamma=gamma)
    sch = lr_mod.cosine_annealing_warmup_restarts(
        first_cycle_steps=first, max_lr=0.5, min_lr=1e-3,
        warmup_steps=warmup, gamma=gamma, cycle_mult=cycle_mult)

    for i in range(n_steps):
        want = opt.param_groups[0]["lr"]
        got = float(sch(i))
        assert got == pytest.approx(want, abs=1e-6), (i, got, want)
        ref.step()


def test_poly_and_exp_schedules():
    p = lr_mod.poly(2.0, max_iter=99, power=1.0)
    assert float(p(0)) == pytest.approx(2.0)
    assert float(p(50)) == pytest.approx(2.0 * 0.5)
    e = lr_mod.exp(1.0, step_size=10, gamma=0.5)
    assert float(e(10)) == pytest.approx(0.5)


def _toy_cfg():
    cfg = get_default_configs(Config(), num_level=2, base_dim=8)
    cfg = get_default_training_cfgs(cfg)
    cfg.update(num_classes=4, learning_rate=0.01, scheduler="MultiStepWithWarmup",
               milestones=[1000], warmup_epochs=1, optimizer="AdamW")
    return cfg


def test_optimizer_and_state():
    cfg = _toy_cfg()
    tx, sch = make_optimizer(cfg, iter_per_epoch=10)
    params = {"w": jnp.ones((3, 3)), "b": jnp.zeros(3)}
    state = create_train_state({"params": params}, tx)
    g = {"w": jnp.ones((3, 3)), "b": jnp.ones(3)}
    updates, new_opt = tx.update(g, state.opt_state, state.params)
    new_params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
    assert float(jnp.abs(new_params["w"] - params["w"]).max()) > 0


def test_grad_accumulation():
    cfg = _toy_cfg()
    cfg.accum_iter = 2
    tx, _ = make_optimizer(cfg, iter_per_epoch=10)
    params = {"w": jnp.ones((2,))}
    os_ = tx.init(params)
    g = {"w": jnp.ones((2,))}
    up1, os_ = tx.update(g, os_, params)
    # first of two accumulation steps: no parameter change yet
    assert float(jnp.abs(up1["w"]).max()) == 0.0
    up2, os_ = tx.update(g, os_, params)
    assert float(jnp.abs(up2["w"]).max()) > 0.0


def test_train_one_epoch_defers_and_flushes_metrics():
    """train_one_epoch reads metrics back only at print boundaries; the
    epoch aggregates must still cover EVERY step, including the remainder
    after the last print_freq boundary."""
    import logging

    from pcf_tpu.train.trainer import train_one_epoch

    cfg = _toy_cfg()
    cfg.print_freq = 2  # 5 steps -> flushes at 2, 4, and the tail at epoch end
    n_steps = 5
    ncls = cfg.num_classes

    class _Step:
        def __init__(self):
            self.calls = 0

        def __call__(self, state, batch, rng):
            self.calls += 1
            metrics = {
                "loss": jnp.float32(self.calls),
                "intersection": jnp.ones(ncls) * self.calls,
                "union": jnp.ones(ncls) * self.calls,
                "target": jnp.ones(ncls) * self.calls,
            }
            return state, metrics

        def lower(self, *a):  # static-HBM probe: pretend no analysis
            raise RuntimeError("no lowering in the stub")

    # loader yields prebuilt "batches" (train_one_epoch only forwards them)
    loader = [object() for _ in range(n_steps)]
    step = _Step()
    state, loss_avg, miou, macc, allacc = train_one_epoch(
        step, state=None, loader=loader, mesh=None, epoch=0, cfg=cfg,
        logger=logging.getLogger("t"), rng_seed=0)
    assert step.calls == n_steps
    # losses 1..5 -> avg 3; histograms summed over all 5 steps -> ratios 1
    assert loss_avg == pytest.approx(3.0)
    assert miou == pytest.approx(1.0)
    assert allacc == pytest.approx(1.0)
