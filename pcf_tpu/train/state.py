"""Train state + optimizer construction.

Replaces the reference's torch optimizer/scheduler wiring
(train_ScanNet_DDP_WarmUP.py:225-282): SGD(momentum=0.9) / Adam / AdamW with
per-step LR schedule, global-norm clip at cfg.grad_clip_norm (reference
clips at 10, :421-424), and gradient accumulation via optax.MultiSteps
(reference accum_iter, :371-374).
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp
import optax

from pcf_tpu.train import lr as lr_schedules


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(cfg, iter_per_epoch: int = 1):
    """optax chain: clip -> optimizer(schedule) [-> accumulation]."""
    schedule = lr_schedules.from_config(cfg, iter_per_epoch)
    if cfg.optimizer == "SGD":
        opt = optax.sgd(schedule, momentum=0.9)
    elif cfg.optimizer == "Adam":
        # torch Adam(weight_decay=d) is COUPLED L2 (decay added to the grad
        # before the moment updates, train_ScanNet_DDP_WarmUP.py:231-236) —
        # not decoupled AdamW. add_decayed_weights BEFORE adam reproduces it.
        opt = optax.chain(
            optax.add_decayed_weights(cfg.decay_rate),
            optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8),
        )
    elif cfg.optimizer == "AdamW":
        opt = optax.adamw(schedule, weight_decay=cfg.adamw_decay)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")

    tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    if cfg.get("accum_iter", 1) > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_iter)
    return tx, schedule


def create_train_state(variables, tx) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
