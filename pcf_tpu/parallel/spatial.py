"""Spatial (point-dimension) sharding: one giant scene across the mesh.

A TPU-native EXTENSION beyond the reference's capability surface (SURVEY.md
§5: the reference handles large scenes only by cropping/chunking,
scannet_data_loader_color_DDP.py:247-250, test_ScanNet_voting.py:35-73).
Here the packed pyramid's point dimension is sharded over the data mesh:
every device keeps its row shard of features, activations and — crucially —
the K-wide gathered tensors and WeightNet intermediates that dominate HBM
(16x the feature maps at K=16). Per layer, ONE all_gather of the [N, C]
gather-source features rides the ICI (cfg.spatial_axis, see
pcf_tpu/nn/layers._spatial_full); neighbor indices stay global, so results
are bitwise-identical to the single-device forward.

This scales single-scene INFERENCE to point counts whose activation pyramid
exceeds one chip's HBM — and, via `make_spatial_train_step` (below,
dryrun-tested in `__graft_entry__.dryrun_multichip`), the same row-sharding
composes with data parallelism into a 2-D data×space mesh for training on
scenes too large for one chip. Ordinary multi-scene training still wants
plain data parallelism (parallel/mesh.py), which shards whole scenes.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from pcf_tpu.core.batching import PackedPyramid
from pcf_tpu.parallel.mesh import AXIS, Mesh


def spatial_eval_forward(cfg, variables, batch: PackedPyramid, mesh: Mesh):
    """One-shot eval forward with the point dim sharded over the mesh.

    Every per-level capacity must be divisible by mesh.size (bucketed caps
    are powers-of-two multiples, so any power-of-two mesh works). Returns
    the full [N0, num_classes] logits. For repeated calls build the step
    once with make_spatial_eval_step.
    """
    return make_spatial_eval_step(cfg, mesh)(variables, batch)


def make_spatial_eval_step(cfg, mesh: Mesh):
    """Jitted eval step (state, batch) -> full logits with the point dim
    sharded over the mesh's last axis. Compiles once; spatial_eval_forward
    is the one-shot convenience wrapper."""
    from pcf_tpu.models import PointConvFormer_Segmentation

    sp_axis = tuple(mesh.axis_names)[-1]
    cfg = cfg.copy()
    cfg.spatial_axis = sp_axis
    cfg.bn_axis_name = None  # eval: running stats, no cross-shard reduction
    assert cfg.get("transformer_type", "PCF") == "PCF", (
        "spatial sharding is implemented for the PCF layer family")
    model = PointConvFormer_Segmentation(cfg)

    def fwd(variables, b):
        return model.apply(
            variables, b.feats, list(b.points), list(b.edges_self),
            list(b.edges_forward), list(b.edges_propagate), list(b.norms),
            masks=list(b.masks), train=False)

    def step(state, batch):
        _check_divisible(batch, mesh.shape[sp_axis])
        batch = _unwrap_windows(batch)
        variables = (state if isinstance(state, dict) else
                     {"params": state.params,
                      "batch_stats": state.batch_stats})
        batch_spec = jax.tree_util.tree_map(lambda _: P(sp_axis), batch)
        return jax.shard_map(
            fwd, mesh=mesh, in_specs=(P(), batch_spec),
            out_specs=P(sp_axis), check_vma=False)(variables, batch)

    return jax.jit(step)


def _check_divisible(batch: PackedPyramid, n: int):
    for lvl, pts in enumerate(batch.points):
        assert pts.shape[0] % n == 0, (
            f"level {lvl} cap {pts.shape[0]} not divisible by mesh size {n}; "
            "pick bucket_multiple / level_caps divisible by the mesh")


def _unwrap_windows(batch: PackedPyramid) -> PackedPyramid:
    from pcf_tpu.ops.window import plain_edges

    return batch.replace(
        edges_self=tuple(plain_edges(e) for e in batch.edges_self),
        edges_forward=tuple(plain_edges(e) for e in batch.edges_forward),
        edges_propagate=tuple(plain_edges(e) for e in batch.edges_propagate))


def make_spatial_train_step(cfg, tx, mesh: Mesh, class_weights=None):
    """Train step with ONE batch's point dimension sharded over the mesh —
    training on scenes too large for a single chip's HBM (no reference
    counterpart; the DP path shards whole scenes instead).

    Semantics match the single-device step exactly (up to float
    reassociation): BN batch statistics psum over the shards (the same
    global sums), the masked smoothed-CE numerator/denominator psum before
    dividing, and the replicated parameters' gradients psum — XLA derives
    the reduce_scatter/all_gather pairs from the per-layer gather
    collectives' transposes.

    2-D meshes compose DP with spatial sharding: a mesh with axes
    (data_axis, space_axis) takes a stack_batches()-stacked batch
    ([D, ...] leaves), shards scenes over data_axis and each scene's points
    over space_axis. The objective is then the DP convention — the MEAN over
    scenes of each scene's (space-psum'ed) loss — with SyncBN statistics
    psum'ed over BOTH axes, matching sync_bn under DDP.

    Returns step_fn(state, batch, rng) -> (state, metrics); `batch` is one
    packed pyramid WITHOUT a leading device axis (1-D mesh), or a stacked
    [D, ...] batch (2-D mesh); sharding happens internally.
    """
    import jax.numpy as jnp

    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel.mesh import _forward, _squeeze0
    from pcf_tpu.train.loss import cross_entropy_loss
    from pcf_tpu.train.metrics import intersection_and_union
    from pcf_tpu.train.state import TrainState

    axes = tuple(mesh.axis_names)
    assert len(axes) in (1, 2), "mesh must be (space,) or (data, space)"
    sp_axis = axes[-1]
    data_axis = axes[0] if len(axes) == 2 else None
    n_space = mesh.shape[sp_axis]

    cfg = cfg.copy()
    cfg.spatial_axis = sp_axis
    # SyncBN over every mesh axis: point shards AND (2-D) scene shards
    cfg.bn_axis_name = axes if len(axes) > 1 else sp_axis
    assert cfg.get("transformer_type", "PCF") == "PCF", (
        "spatial sharding is implemented for the PCF layer family")
    model = PointConvFormer_Segmentation(cfg)
    cw = (jnp.asarray(class_weights, jnp.float32)
          if class_weights is not None else None)
    num_classes = cfg.num_classes

    def shard_step(state: TrainState, batch: PackedPyramid, rng):
        if data_axis is not None:
            batch = _squeeze0(batch)  # drop the per-device scene axis
            rng = jax.random.fold_in(rng, jax.lax.axis_index(data_axis))
        # independent dropout streams per shard (a single-device step draws
        # one mask over all rows; identical keys would tile one pattern)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(sp_axis))

        def loss_fn(params):
            logits, new_bs = _forward(
                model, params, state.batch_stats, batch, cfg, True, rng)
            # per-scene global loss: psum num/den over the POINT shards only
            loss, _ = cross_entropy_loss(
                logits, batch.labels, mask=batch.masks[0], class_weights=cw,
                label_smoothing=float(cfg.label_smoothing or 0.0),
                ignore_label=cfg.ignore_label, axis_name=sp_axis)
            return loss, (logits, new_bs)

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        # each point shard's grad is a partial contribution to its scene's
        # global loss: SUM over space; scenes average like DP (pmean)
        grads = jax.lax.psum(grads, sp_axis)
        if data_axis is not None:
            grads = jax.lax.pmean(grads, data_axis)
            loss = jax.lax.pmean(loss, data_axis)

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates)

        pred = jnp.argmax(logits, axis=-1)
        inter, union, target = intersection_and_union(
            pred, batch.labels, num_classes, cfg.ignore_label,
            mask=batch.masks[0])
        metrics = {
            "loss": loss,
            "intersection": jax.lax.psum(inter, axes),
            "union": jax.lax.psum(union, axes),
            "target": jax.lax.psum(target, axes),
        }
        new_state = TrainState(step=state.step + 1, params=new_params,
                               batch_stats=new_bs, opt_state=new_opt)
        return new_state, metrics

    def step(state, batch, rng):
        _check_divisible(
            batch if data_axis is None else _squeeze0(batch), n_space)
        batch = _unwrap_windows(batch)
        leaf_spec = P(*axes) if data_axis is not None else P(sp_axis)
        batch_spec = jax.tree_util.tree_map(lambda _: leaf_spec, batch)
        sharded = jax.shard_map(
            shard_step, mesh=mesh,
            in_specs=(P(), batch_spec, P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
        return sharded(state, batch, rng)

    return jax.jit(step)
