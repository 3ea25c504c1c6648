"""ICI-traffic audit of the spatial (point-dim) sharding at scale.

VERDICT r4 #8: `_spatial_full` (nn/layers.py) all_gathers the FULL gather-
source tensors per layer, so per-chip memory for the gathered tables is O(N)
regardless of mesh size — fine at 2cm scale, a wall at ~10x that. This tool
makes the limit quantitative: it AOT-compiles the spatial-sharded eval step
(parallel/spatial.make_spatial_eval_step) for a v5e 2x2 topology at
2cm-scale shapes (120k raw points/scene, pcf_2cm_ptf2 grids) and reports,
from the optimized SPMD module itself:

  * every all-gather instruction's payload (bytes put on the ICI per chip
    per step) grouped by pyramid level / tensor,
  * the total ICI bytes/step and the implied ICI time at v5e ring bandwidth,
  * XLA's per-chip memory analysis (argument/output/temp/peak),

and prints the O(N) crossover: the N0 at which the all_gathered bf16
feature tables alone exceed one chip's free HBM.

Compile-only (local libtpu AOT, no chip claim) — runs alongside a live
bench. Usage:
  env -u PALLAS_AXON_POOL_IPS -u PALLAS_AXON_REMOTE_COMPILE \
      JAX_PLATFORMS=cpu python tools/spatial_ici_audit.py [--points 120000]
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, ".")

os.environ.setdefault("TPU_ACCELERATOR_TYPE", "v5litepod-4")
os.environ.setdefault("TPU_WORKER_HOSTNAMES", "localhost")
os.environ.setdefault("TPU_SKIP_MDS_QUERY", "1")

# v5e ICI: 4 links/chip x ~186 GB/s bidirectional spec sheet per 2x2 ring —
# use a conservative 100 GB/s effective per-chip all-gather throughput for
# the implied-time estimate (order-of-magnitude context, not a measurement).
ICI_GBPS = 100.0

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                "f16": 2, "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def _shape_bytes(shape_str: str) -> int:
    """'bf16[512000,64]{1,0}' -> payload bytes."""
    m = re.match(r"([a-z0-9]+)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES.get(dt, 4)


def collect_allgathers(hlo_text: str):
    """(shape, metadata-op_name) of every all-gather in the module.

    Instruction form (layout annotations include :T(8,128)(2,1) tiling):
      %all-gather.9 = bf16[90112,32]{0,1:T(8,128)(2,1)} all-gather(%p), ...
    The payload counted is the gathered RESULT's logical bytes."""
    out = []
    for line in hlo_text.splitlines():
        s = line.strip()
        if (" all-gather(" not in s and " all-gather-start(" not in s) \
                or " = " not in s:
            continue
        head = s.split(" all-gather")[0]
        shapes = re.findall(r"[a-z0-9]+\[[0-9,]*\]", head.split(" = ")[-1])
        meta = re.search(r'op_name="([^"]*)"', s)
        if shapes:
            out.append((shapes[-1], meta.group(1) if meta else "?"))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=120000)
    ap.add_argument("--extent", type=float, default=7.0)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    import jax
    import numpy as np
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from benchmarks.scale_bench import build_case
    from pcf_tpu.parallel.spatial import make_spatial_eval_step

    cfg, batch, level_sizes, _ = build_case(
        "2cm", args.points, 1, window=False, extent=args.extent)
    cfg.compute_dtype = args.dtype
    print(f"2cm spatial case: level caps "
          f"{[int(p.shape[0]) for p in batch.points]}")

    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    mesh = Mesh(np.array(topo.devices).reshape(4), ("space",))

    step = make_spatial_eval_step(cfg, mesh)

    import jax.numpy as jnp
    from pcf_tpu.models import PointConvFormer_Segmentation

    model = PointConvFormer_Segmentation(cfg)
    variables = jax.eval_shape(
        lambda k: model.init(k, batch.feats, list(batch.points),
                             list(batch.edges_self), list(batch.edges_forward),
                             list(batch.edges_propagate), list(batch.norms),
                             masks=list(batch.masks), train=False),
        jax.random.PRNGKey(0))
    lowered = step.lower(variables, batch)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    ags = collect_allgathers(hlo)
    rows = {}
    total = 0
    for shape, op in ags:
        b = _shape_bytes(shape)
        total += b
        key = (shape, op.split("/")[-1][:40])
        rows.setdefault(key, [0, 0])
        rows[key][0] += 1
        rows[key][1] += b
    print(f"\nall-gather instructions: {len(ags)}, "
          f"total {total / 2**20:.1f} MiB/step/chip received "
          f"(~{total / ICI_GBPS / 1e9 * 1e3:.2f} ms at {ICI_GBPS:.0f} GB/s "
          f"effective ICI)")
    for (shape, op), (n, b) in sorted(rows.items(), key=lambda kv: -kv[1][1]):
        print(f"  {b/2**20:9.1f} MiB  x{n:<3d} {shape:<24} {op}")

    mem = compiled.memory_analysis()
    if mem is not None:
        print(f"\nper-chip memory: args {mem.argument_size_in_bytes/2**30:.2f} "
              f"GiB, temps {mem.temp_size_in_bytes/2**30:.2f} GiB, "
              f"output {mem.output_size_in_bytes/2**30:.2f} GiB")

    # The O(N) statement: gathered tables are full-size per chip. Largest
    # SINGLE gathered buffer (not the per-shape aggregate, which multiplies
    # by instruction count).
    biggest = max((_shape_bytes(shape) for shape, _ in ags), default=0)
    free_gib = 12.0  # ~16 GiB v5e minus runtime/weights/activations slack
    print(f"\nO(N) limit: largest all_gathered table {biggest/2**20:.1f} MiB "
          f"at N0={args.points}; full-table-per-chip design crosses "
          f"{free_gib:.0f} GiB free HBM at roughly "
          f"N0~{int(args.points * free_gib * 2**30 / max(total, 1))} points "
          f"(sum of gathered tables scaling linearly).")
    print(json.dumps({
        "n_allgathers": len(ags),
        "ici_mib_per_step": round(total / 2**20, 1),
        "implied_ms_at_100GBps": round(total / ICI_GBPS / 1e9 * 1e3, 3),
        "temp_gib": round(mem.temp_size_in_bytes / 2**30, 3) if mem else None,
    }))


if __name__ == "__main__":
    main()
