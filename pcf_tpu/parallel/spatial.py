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
exceeds one chip's HBM. Eval-only by design: training wants data parallelism
(parallel/mesh.py), which shards whole scenes instead.
"""

from __future__ import annotations

import jax
from jax.sharding import PartitionSpec as P

from pcf_tpu.core.batching import PackedPyramid
from pcf_tpu.parallel.mesh import AXIS, Mesh


def spatial_eval_forward(cfg, variables, batch: PackedPyramid, mesh: Mesh):
    """Eval forward of one packed batch with the point dim sharded over mesh.

    Every per-level capacity must be divisible by mesh.size (bucketed caps
    are powers-of-two multiples, so any power-of-two mesh works).
    Returns the full [N0, num_classes] logits.
    """
    from pcf_tpu.models import PointConvFormer_Segmentation

    n = mesh.size
    for lvl, pts in enumerate(batch.points):
        assert pts.shape[0] % n == 0, (
            f"level {lvl} cap {pts.shape[0]} not divisible by mesh size {n}; "
            "pick bucket_multiple / level_caps divisible by the mesh")
    assert cfg.get("transformer_type", "PCF") == "PCF", (
        "spatial sharding is implemented for the PCF layer family")

    cfg = cfg.copy()
    cfg.spatial_axis = AXIS
    cfg.bn_axis_name = None  # eval: running stats, no cross-shard reduction
    model = PointConvFormer_Segmentation(cfg)

    # Spatial sharding runs the plain gather path: WindowedEdges tile counts
    # need not divide the mesh, and windowed gathers under a row-sharded
    # layout are unvalidated — unwrap to the raw [M, K] edge arrays.
    from pcf_tpu.ops.window import plain_edges

    batch = batch.replace(
        edges_self=tuple(plain_edges(e) for e in batch.edges_self),
        edges_forward=tuple(plain_edges(e) for e in batch.edges_forward),
        edges_propagate=tuple(plain_edges(e) for e in batch.edges_propagate))

    def fwd(vs, b):
        return model.apply(
            vs, b.feats, list(b.points), list(b.edges_self),
            list(b.edges_forward), list(b.edges_propagate), list(b.norms),
            masks=list(b.masks), train=False)

    batch_spec = jax.tree_util.tree_map(lambda _: P(AXIS), batch)
    sharded = jax.shard_map(
        fwd, mesh=mesh,
        in_specs=(P(), batch_spec),
        out_specs=P(AXIS),
        check_vma=False,
    )
    return jax.jit(sharded)(variables, batch)
