"""Learning-rate schedules as optax-compatible callables.

Functional JAX equivalents of the reference's torch schedulers (util/lr.py):
MultiStepWithWarmup (:48-65), CosineAnnealingWarmupRestarts (:121-207),
PolyLR / PolyLRwithWarmup (:29-46,68-74), SquaredLR (:77-81), ExpLR (:84-90),
StepLR and OneCycle (via optax). Each returns f(step) -> lr.
"""

from __future__ import annotations

import jax.numpy as jnp
import optax


def _warmup_coeff(step, warmup_iters: int, warmup_ratio: float):
    """Linear warmup factor (reference: util/lr.py:59-62):
    1 - (1 - s/warmup_iters) * (1 - warmup_ratio) for s <= warmup_iters."""
    w = 1.0 - (1.0 - step / jnp.maximum(warmup_iters, 1)) * (1.0 - warmup_ratio)
    return jnp.where(step <= warmup_iters, w, 1.0)


def multistep_with_warmup(
    base_lr: float,
    milestones: list[int],
    gamma: float = 0.1,
    warmup_iters: int = 10,
    warmup_ratio: float = 1e-6,
):
    """MultiStepWithWarmup (util/lr.py:48-65). Milestones in steps."""
    ms = jnp.asarray(milestones, jnp.float32) if milestones else jnp.zeros((0,))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        factor = gamma ** jnp.sum(step >= ms)
        return base_lr * factor * _warmup_coeff(step, warmup_iters, warmup_ratio)

    return schedule


def cosine_annealing_warmup_restarts(
    first_cycle_steps: int,
    max_lr: float,
    min_lr: float = 1e-8,
    warmup_steps: int = 0,
    gamma: float = 1.0,
    cycle_mult: float = 1.0,
    max_cycles: int = 128,
):
    """CosineAnnealingWarmupRestarts (util/lr.py:121-207), full generality.

    The reference's step() recursion grows each cycle as
    c_{n+1} = int((c_n - warmup) * cycle_mult) + warmup and decays the cycle
    peak as max_lr * gamma^n. Cycle lengths depend only on static params, so
    the boundaries are precomputed (numpy, exact int arithmetic matching the
    torch int() casts) and the jittable schedule just searchsorts the global
    step into its cycle. max_cycles bounds the table; 128 cycles covers any
    real run (cycle_mult>1 grows lengths geometrically; cycle_mult=1 at
    length>=1 gives 128 * first_cycle_steps steps minimum).
    """
    import numpy as np

    lengths = []
    cur = int(first_cycle_steps)
    for _ in range(max_cycles):
        lengths.append(cur)
        cur = int((cur - warmup_steps) * cycle_mult) + warmup_steps
    starts = np.concatenate([[0], np.cumsum(lengths)])  # [max_cycles+1]
    starts_j = jnp.asarray(starts[:-1], jnp.float32)
    lengths_j = jnp.asarray(lengths, jnp.float32)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        # cycle n such that starts[n] <= step < starts[n+1]
        cycle = jnp.sum(step >= jnp.asarray(starts[1:], jnp.float32))
        cycle = jnp.minimum(cycle, max_cycles - 1)
        s = step - starts_j[cycle]
        length = lengths_j[cycle]
        cycle_max = max_lr * (gamma ** cycle)
        warm = min_lr + (cycle_max - min_lr) * s / jnp.maximum(warmup_steps, 1)
        cos = min_lr + (cycle_max - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * (s - warmup_steps)
                          / jnp.maximum(length - warmup_steps, 1))
        )
        return jnp.where(s < warmup_steps, warm, cos)

    return schedule


def poly_with_warmup(base_lr, max_iter, warmup_iters=1500, warmup_ratio=1e-6, power=1.0):
    """PolyLRwithWarmup (util/lr.py:29-46)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        coeff = (1.0 - step / (max_iter + 1)) ** power
        return base_lr * coeff * _warmup_coeff(step, warmup_iters, warmup_ratio)

    return schedule


def poly(base_lr, max_iter, power=0.9):
    """PolyLR (util/lr.py:68-74)."""
    return lambda step: base_lr * (1.0 - jnp.asarray(step, jnp.float32) / (max_iter + 1)) ** power


def squared(base_lr, max_iter):
    """SquaredLR (util/lr.py:77-81)."""
    return poly(base_lr, max_iter, power=2.0)


def exp(base_lr, step_size, gamma=0.9):
    """ExpLR (util/lr.py:84-90)."""
    return lambda step: base_lr * gamma ** (jnp.asarray(step, jnp.float32) / step_size)


def step_lr(base_lr, step_size, gamma=0.1):
    """torch StepLR."""
    return lambda step: base_lr * gamma ** jnp.floor(jnp.asarray(step, jnp.float32) / step_size)


def onecycle(max_lr, total_steps, pct_start=0.3, div_factor=25.0, final_div_factor=1e4):
    """OneCycleLR via optax (util/lr.py:110-113)."""
    return optax.cosine_onecycle_schedule(
        transition_steps=total_steps,
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def from_config(cfg, iter_per_epoch: int):
    """Build the trainer's schedule from a YAML config
    (reference wiring: train_ScanNet_DDP_WarmUP.py:250-282)."""
    if cfg.scheduler == "MultiStepWithWarmup":
        if cfg.get("milestones"):
            milestones = [int(v * iter_per_epoch) for v in cfg.milestones]
        else:
            milestones = [
                int(cfg.total_epoches * f) * iter_per_epoch for f in (0.4, 0.6, 0.8)
            ]
        return multistep_with_warmup(
            cfg.learning_rate, milestones, gamma=cfg.gamma,
            warmup_iters=cfg.warmup_epochs * iter_per_epoch,
            warmup_ratio=cfg.warmup_ratio)
    elif cfg.scheduler == "CosineAnnealingWarmupRestarts":
        return cosine_annealing_warmup_restarts(
            first_cycle_steps=cfg.total_epoches * iter_per_epoch,
            max_lr=cfg.learning_rate, min_lr=1e-8,
            warmup_steps=cfg.warmup_epochs * iter_per_epoch, gamma=1.0)
    elif cfg.scheduler == "Constant":
        return lambda step: cfg.learning_rate
    raise ValueError(f"No such scheduler {cfg.scheduler}")
