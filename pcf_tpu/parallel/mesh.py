"""Data-parallel training over a TPU mesh.

TPU-native replacement for the reference's DDP/NCCL stack
(train_ScanNet_DDP_WarmUP.py:153-195, run_distributed.sh): a 1-D 'data' mesh,
`jax.shard_map` over it, `psum` for gradients/metrics (the reference's
implicit DDP buckets + explicit dist.all_reduce calls, :434-449), and
psum'ed BatchNorm statistics standing in for SyncBatchNorm (:192-193) when
cfg.sync_bn is set (wired via cfg.bn_axis_name='data').

Each device processes ONE packed pyramid (which itself contains several
scenes — the packed analog of the per-GPU batch). Batches are stacked on a
leading axis of size mesh.size and sharded across it; parameters and
optimizer state are replicated.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from pcf_tpu.core.batching import PackedPyramid
from pcf_tpu.train.loss import cross_entropy_loss
from pcf_tpu.train.metrics import intersection_and_union
from pcf_tpu.train.state import TrainState

AXIS = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    import numpy as np

    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def stack_batches(batches: list[PackedPyramid]) -> PackedPyramid:
    """Stack per-device packed pyramids on a new leading axis [D, ...]."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)


def _squeeze0(tree):
    return jax.tree_util.tree_map(lambda x: x[0], tree)


def _forward(model, params, batch_stats, batch: PackedPyramid, cfg, train, rng):
    variables = {"params": params, "batch_stats": batch_stats}
    kwargs = dict(mutable=["batch_stats"], rngs={"dropout": rng}) if train else {}
    out = model.apply(
        variables,
        batch.feats,
        list(batch.points),
        list(batch.edges_self),
        list(batch.edges_forward),
        list(batch.edges_propagate),
        list(batch.norms),
        masks=list(batch.masks),
        train=train,
        **kwargs,
    )
    if train:
        logits, new_state = out
        return logits, new_state["batch_stats"]
    return out, batch_stats


def make_train_step(
    model,
    tx,
    cfg,
    mesh: Mesh | None = None,
    class_weights=None,
) -> Callable[[TrainState, PackedPyramid, jnp.ndarray], tuple]:
    """Build the jitted (optionally sharded) train step.

    Returns step_fn(state, batch, rng) -> (state, metrics dict). With a mesh,
    batch leaves carry a leading device axis sharded over AXIS.
    """
    num_classes = cfg.num_classes
    label_smoothing = float(cfg.label_smoothing or 0.0)
    ignore_label = cfg.ignore_label
    cw = None
    if class_weights is not None:
        cw = jnp.asarray(class_weights, jnp.float32)

    def device_step(state: TrainState, batch: PackedPyramid, rng):
        def loss_fn(params):
            logits, new_bs = _forward(
                model, params, state.batch_stats, batch, cfg, True, rng)
            loss, cnt = cross_entropy_loss(
                logits, batch.labels, mask=batch.masks[0], class_weights=cw,
                label_smoothing=label_smoothing, ignore_label=ignore_label)
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        if mesh is not None:
            grads = jax.lax.pmean(grads, AXIS)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)

        pred = jnp.argmax(logits, axis=-1)
        inter, union, target = intersection_and_union(
            pred, batch.labels, num_classes, ignore_label, mask=batch.masks[0])
        metrics = {"loss": loss, "intersection": inter, "union": union,
                   "target": target}
        if mesh is not None:
            metrics = jax.tree_util.tree_map(
                lambda m: jax.lax.pmean(m, AXIS) if m.ndim == 0
                else jax.lax.psum(m, AXIS), metrics)

        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    if mesh is None:
        return jax.jit(device_step)

    def sharded_step(state, batch, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(AXIS))
        return device_step(state, _squeeze0(batch), rng)

    smapped = jax.shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P(), P(AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(smapped)


def make_eval_step(model, cfg, mesh: Mesh | None = None):
    """Inference step: logits with running BN stats (reference eval fuses BN,
    test_ScanNet_simple.py:139-142 — here XLA constant-folds the affine)."""

    def device_eval(state: TrainState, batch: PackedPyramid):
        logits, _ = _forward(model, state.params, state.batch_stats, batch,
                             cfg, False, None)
        return logits

    if mesh is None:
        return jax.jit(device_eval)

    smapped = jax.shard_map(
        lambda s, b: device_eval(s, _squeeze0(b))[None],
        mesh=mesh,
        in_specs=(P(), P(AXIS)),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return jax.jit(smapped)
