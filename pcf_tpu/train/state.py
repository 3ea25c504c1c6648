"""Train state + optimizer construction.

Replaces the reference's torch optimizer/scheduler wiring
(train_ScanNet_DDP_WarmUP.py:225-282): SGD(momentum=0.9) / Adam / AdamW with
per-step LR schedule, global-norm clip at cfg.grad_clip_norm (reference
clips at 10, :421-424), and torch-exact gradient accumulation
(reference accum_iter, :371-374,417-424).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from pcf_tpu.train import lr as lr_schedules


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


class TorchAccumState(NamedTuple):
    count: jnp.ndarray   # global micro-step counter (drives the LR schedule)
    acc: Any             # running clipped gradient accumulation
    inner: Any           # core optimizer state (advances once per real step)


def _torch_clip_coeff(tree, clip_norm: float):
    """torch.nn.utils.clip_grad_norm_ scaling: min(1, c/(||g||+1e-6))."""
    gnorm = optax.global_norm(tree)
    return jnp.minimum(clip_norm / (gnorm + 1e-6), 1.0)


def torch_grad_accum(core, schedule, accum_iter: int, clip_norm: float):
    """Torch-exact accumulation (train_ScanNet_DDP_WarmUP.py:417-424).

    The reference divides the loss by accum_iter, backprops (grads *sum*
    into .grad), and calls clip_grad_norm_(10) on EVERY micro-iteration —
    so the *partial accumulation* is re-clipped each micro-step, not just
    the final sum. The optimizer steps at accumulation boundaries with the
    LR of the current micro-step (scheduler.step() runs per iteration).

    optax.MultiSteps(chain(clip, opt)) gets both wrong: it clips only the
    final mean, and its inner schedule count advances once per *real* step
    (LR lags by a factor of accum_iter). This transformation reproduces the
    torch semantics exactly:

      acc   <- clip(acc + g / accum_iter)       every micro-step
      step:  params += -schedule(micro_step) * core(acc);  acc <- 0
    """

    def init(params):
        return TorchAccumState(
            count=jnp.zeros((), jnp.int32),
            acc=jax.tree_util.tree_map(jnp.zeros_like, params),
            inner=core.init(params),
        )

    def update(grads, state, params=None):
        acc = jax.tree_util.tree_map(
            lambda a, g: a + g / accum_iter, state.acc, grads)
        coef = _torch_clip_coeff(acc, clip_norm)
        acc = jax.tree_util.tree_map(lambda a: a * coef, acc)
        lr = schedule(state.count)

        def do_step(operand):
            acc, inner = operand
            upd, new_inner = core.update(acc, inner, params)
            upd = jax.tree_util.tree_map(lambda u: -lr * u, upd)
            return upd, new_inner, jax.tree_util.tree_map(jnp.zeros_like, acc)

        def no_step(operand):
            acc, inner = operand
            zeros = jax.tree_util.tree_map(jnp.zeros_like, acc)
            return zeros, inner, acc

        upd, new_inner, new_acc = jax.lax.cond(
            (state.count + 1) % accum_iter == 0, do_step, no_step,
            (acc, state.inner))
        return upd, TorchAccumState(state.count + 1, new_acc, new_inner)

    return optax.GradientTransformation(init, update)


def _core_transform(cfg):
    """The optimizer WITHOUT learning-rate scaling (applied separately so the
    schedule can track the global micro-step count under accumulation)."""
    if cfg.optimizer == "SGD":
        return optax.trace(decay=0.9)
    if cfg.optimizer == "Adam":
        # torch Adam(weight_decay=d) is COUPLED L2 (decay added to the grad
        # before the moment updates, train_ScanNet_DDP_WarmUP.py:231-236) —
        # not decoupled AdamW. add_decayed_weights BEFORE adam reproduces it.
        return optax.chain(
            optax.add_decayed_weights(cfg.decay_rate),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        )
    if cfg.optimizer == "AdamW":
        # torch AdamW: p -= lr * (adam_update + wd * p) (decoupled decay
        # scaled by the LR, as optax.adamw does).
        return optax.chain(
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.add_decayed_weights(cfg.adamw_decay),
        )
    raise ValueError(f"unknown optimizer {cfg.optimizer}")


def make_optimizer(cfg, iter_per_epoch: int = 1):
    """clip -> optimizer -> -schedule(step); torch-exact accumulation when
    accum_iter > 1 (see torch_grad_accum)."""
    schedule = lr_schedules.from_config(cfg, iter_per_epoch)
    core = _core_transform(cfg)
    accum = cfg.get("accum_iter", 1)
    if accum > 1:
        tx = torch_grad_accum(core, schedule, accum, cfg.grad_clip_norm)
    else:
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip_norm),
            core,
            optax.scale_by_schedule(lambda c: -schedule(c)),
        )
    return tx, schedule


def create_train_state(variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
