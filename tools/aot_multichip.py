"""Multi-chip compile proof on the REAL TPU target, no hardware needed.

`__graft_entry__.dryrun_multichip` executes the sharded programs on an
8-device CPU mesh (semantics proof). This tool compiles the same programs
against a v5e 2x2 compile-only topology via local libtpu (AOT): the exact
SPMD executables a 4-chip slice would run, with real ICI collectives and
XLA's static per-chip memory analysis. Together they cover execution
semantics AND real-target compilation.

Usage (axon env stripped so nothing dials the relay):
  env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
      JAX_PLATFORMS=cpu python tools/aot_multichip.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, ".")

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")


def main():
    import jax
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from pcf_tpu.config import (Config, get_default_configs,
                                get_default_training_cfgs)
    from pcf_tpu.core import pack_scenes
    from pcf_tpu.data import synthetic_scene
    from pcf_tpu.data.pyramid import scene_to_item
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_eval_step, make_train_step, stack_batches
    from pcf_tpu.train.state import create_train_state, make_optimizer

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(4), ("data",))

    GRID = [0.4, 0.8]
    cfg = get_default_configs(Config(), num_level=2, base_dim=8)
    cfg = get_default_training_cfgs(cfg)
    cfg.update(guided_level=0, num_heads=2, resblocks=[0, 1], mid_dim=[4, 4],
               grid_size=GRID, num_classes=4, learning_rate=0.01,
               scheduler="MultiStepWithWarmup", milestones=[1000],
               warmup_epochs=1, use_level_1=False, sync_bn=True,
               bn_axis_name="data")

    def one_batch(seed):
        coord, norm, feats, labels = synthetic_scene(
            150, extent=3.0, num_classes=4, seed=seed)
        item = scene_to_item(coord, norm, feats, labels, GRID, 8, 8, 8,
                             rng=np.random.default_rng(seed))
        return pack_scenes([item], level_caps=[256, 256])

    batches = [one_batch(i) for i in range(4)]
    stacked = stack_batches(batches)
    b0 = batches[0]
    model = PointConvFormer_Segmentation(cfg)
    vs = model.init(jax.random.PRNGKey(0), b0.feats, list(b0.points),
                    list(b0.edges_self), list(b0.edges_forward),
                    list(b0.edges_propagate), list(b0.norms),
                    masks=list(b0.masks), train=False)
    tx, _ = make_optimizer(cfg, iter_per_epoch=10)
    state = create_train_state(vs, tx)

    out = {"target": "v5e:2x2 (compile-only)", "mesh_axes": {"data": 4}}
    from pcf_tpu.parallel.spatial import spatial_eval_forward

    spatial_batch = pack_scenes([
        scene_to_item(*synthetic_scene(600, extent=4.0, num_classes=4,
                                       seed=9)[:4],
                      GRID, 8, 8, 8, rng=np.random.default_rng(9))
    ], level_caps=[1024, 512])

    from pcf_tpu.parallel import make_spatial_train_step

    mesh2d = Mesh(np.array(topo.devices).reshape(2, 2), ("data", "space"))
    stacked2 = stack_batches(
        [pack_scenes([scene_to_item(*synthetic_scene(
            600, extent=4.0, num_classes=4, seed=s)[:4], GRID, 8, 8, 8,
            rng=np.random.default_rng(s))], level_caps=[1024, 512])
         for s in (11, 12)])

    for name, fn, args in (
        ("train", make_train_step(model, tx, cfg, mesh=mesh),
         (state, stacked, jax.random.PRNGKey(7))),
        ("eval", make_eval_step(model, cfg, mesh=mesh), (state, stacked)),
        ("spatial_eval",
         jax.jit(lambda v, b: spatial_eval_forward(cfg, v, b, mesh)),
         (vs, spatial_batch)),
        ("dp_x_spatial_train", make_spatial_train_step(cfg, tx, mesh2d),
         (state, stacked2, jax.random.PRNGKey(8))),
    ):
        c = fn.lower(*args).compile()
        hlo = c.as_text()
        out[name] = {
            "compiled": True,
            "all_reduce": hlo.count("all-reduce"),
            "all_gather": hlo.count("all-gather"),
            "temp_mib": round(c.memory_analysis().temp_size_in_bytes / 2**20, 2),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
