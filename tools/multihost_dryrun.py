"""Two-process multi-host dryrun (VERDICT r2 #7).

The reference bootstraps one torch process per GPU and syncs them with NCCL
(train_ScanNet_DDP_WarmUP.py:153-166). The JAX analog is one process per
HOST: `jax.distributed.initialize` + a mesh spanning every process's local
devices, per-host loader index sharding (data/scannet.PackedLoader
process_index/process_count) replacing DistributedSampler, and psum'ed
grads/metrics riding cross-process collectives.

Multi-host TPU hardware is unavailable here, so this exercises the REAL
multi-process path on the CPU backend: the parent spawns 2 child processes
(2 virtual devices each -> a 4-device global mesh), each child

  1. jax.distributed.initialize(coordinator, num_processes=2, process_id=r)
     with gloo cross-process CPU collectives,
  2. shards scene indices per host exactly like the trainer's loader
     (host r takes scenes r::2),
  3. builds its LOCAL device batches and assembles the global array with
     jax.make_array_from_process_local_data over the global mesh,
  4. runs 2 steps of the production make_train_step (shard_map + psum
     grads/metrics + SyncBN psum) and prints the psum'ed loss.

The parent asserts both children exit 0, report process_count=2, and print
IDENTICAL per-step losses (the collective result must agree on every host).

Usage: python tools/multihost_dryrun.py  (parent; no args)
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

PORT = 47621
STEPS = 2


def child(rank: int) -> None:
    import jax

    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{PORT}",
        num_processes=2,
        process_id=rank,
    )
    assert jax.process_count() == 2, jax.process_count()
    n_local = jax.local_device_count()
    n_global = jax.device_count()
    assert n_global == 2 * n_local, (n_global, n_local)
    print(f"[host {rank}] process_count={jax.process_count()} "
          f"local_devices={n_local} global_devices={n_global}", flush=True)

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pcf_tpu.config import Config, get_default_configs, get_default_training_cfgs
    from pcf_tpu.core import pack_scenes
    from pcf_tpu.data import synthetic_scene
    from pcf_tpu.data.pyramid import scene_to_item
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.parallel import make_mesh, make_train_step, stack_batches
    from pcf_tpu.train.state import create_train_state, make_optimizer

    grid = [0.4, 0.8, 1.6]
    cfg = get_default_configs(Config(), num_level=3, base_dim=16)
    cfg = get_default_training_cfgs(cfg)
    cfg.update(guided_level=0, num_heads=4, resblocks=[0, 1, 1],
               mid_dim=[4, 4, 4], grid_size=grid, num_classes=8, USE_PE=True,
               scheduler="MultiStepWithWarmup", milestones=[100],
               warmup_epochs=1, sync_bn=True, bn_axis_name="data")

    # Per-host scene sharding, the trainer's loader semantics
    # (PackedLoader: idx[process_index::process_count]): with one scene per
    # global device slot, host r owns global slots where slot % 2 == r.
    caps = [512, 256, 256]
    local_batches = []
    for slot in range(n_global):
        if slot % 2 != rank:
            continue
        coord, norm, feats, labels = synthetic_scene(
            400, extent=4.0, num_classes=8, seed=slot)
        item = scene_to_item(coord, norm, feats, labels, grid, 8, 8, 8,
                             rng=np.random.default_rng(slot))
        local_batches.append(pack_scenes([item], level_caps=caps))
    local = stack_batches(local_batches)  # [n_local, ...]

    mesh = make_mesh(n_global)  # global mesh over both processes
    data_shd = NamedSharding(mesh, P("data"))
    repl_shd = NamedSharding(mesh, P())

    def globalize(tree, sharding):
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), tree)

    gbatch = globalize(local, data_shd)

    b0 = local_batches[0]
    model = PointConvFormer_Segmentation(cfg)
    variables = model.init(
        jax.random.PRNGKey(0), b0.feats, list(b0.points), list(b0.edges_self),
        list(b0.edges_forward), list(b0.edges_propagate), list(b0.norms),
        masks=list(b0.masks), train=False)

    tx, _ = make_optimizer(cfg, iter_per_epoch=10)
    state = create_train_state(variables, tx)
    state = globalize(state, repl_shd)  # same PRNG init on every host

    step = make_train_step(model, tx, cfg, mesh=mesh)
    for i in range(STEPS):
        state, metrics = step(state, gbatch, jax.random.PRNGKey(100 + i))
        loss = float(metrics["loss"])
        assert np.isfinite(loss), loss
        print(f"[host {rank}] step {i} loss={loss:.6f}", flush=True)

    jax.distributed.shutdown()


def parent() -> None:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    env["JAX_PLATFORMS"] = "cpu"
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f)
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()
    env.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")

    me = os.path.abspath(__file__)
    procs = [subprocess.Popen(
        [sys.executable, me, "--rank", str(r)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for r in range(2)]
    outs = []
    for r, p in enumerate(procs):
        out, _ = p.communicate(timeout=900)
        outs.append(out)
        sys.stdout.write(out)
        if p.returncode != 0:
            raise SystemExit(f"host {r} failed rc={p.returncode}")

    # both hosts must agree on every psum'ed loss, and must have actually
    # run as 2 distinct jax processes
    losses = [re.findall(r"step (\d+) loss=([\d.]+)", o) for o in outs]
    assert losses[0] and losses[0] == losses[1], losses
    assert all(f"process_count=2" in o for o in outs), "not multi-process"
    print(f"multihost_dryrun: 2 hosts x 2 devices, {len(losses[0])} steps, "
          f"losses identical across hosts OK")


if __name__ == "__main__":
    if "--rank" in sys.argv:
        child(int(sys.argv[sys.argv.index("--rank") + 1]))
    else:
        parent()
