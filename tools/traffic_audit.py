"""Itemized HBM-traffic audit of the compiled flagship programs.

VERDICT r3 #2's fallback deliverable: "a committed on-chip profile showing
eval HBM traffic within ~15% of the achievable-bandwidth wall with the
remaining gap itemized". The r3 layout study summed shape mentions by hand;
this tool does the accounting properly, from the scheduled HLO the chip
actually runs:

- every top-level instruction of the entry computation materializes its
  output buffer (fusions materialize exactly one output; their interior is
  fused and moves no HBM bytes),
- its top-level operands are that instruction's HBM reads,
- each buffer's PHYSICAL size follows its layout annotation
  (`{minor_to_major:T(s,128)(p,1)}`): the minor physical dim pads to 128
  lanes, the second-minor to `s*p` sublanes (f32 T(8,128); bf16
  T(8,128)(2,1) = 16; int8/fp8 (4,1) = 32). A transposed dim order
  ({0,1}: rows minor) changes which dims pad — the same logical shape can
  cost 8x more or nothing depending on this choice (RESULTS.md r4,
  hbm_peak.py copy_narrow).

Bytes are attributed to instruction categories (fusion kinds, copies,
gathers/scatters, dots, convs) and to model layers via op_name metadata.
Dividing total bytes by the measured wall time gives achieved GB/s to
compare against the hbm_peak.py practical wall.

Caveats: this is the buffer-graph upper bound on traffic — it assumes every
materialized buffer is written and read back from HBM once per use. Buffers
that stay resident in VMEM across consumers (XLA:TPU does this for small
temps) cost less; the audit therefore brackets the truth from above, which
is the right direction for a floor statement.

Usage:
  python tools/traffic_audit.py [--train] [--top 25] [--by-layer]
"""

from __future__ import annotations

import argparse
import re
import sys
from collections import defaultdict

sys.path.insert(0, ".")

_ITEMSIZE = {"f64": 8, "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
             "s64": 8, "u64": 8, "s16": 2, "u16": 2, "s8": 1, "u8": 1,
             "pred": 1, "f8e4m3fn": 1, "f8e5m2": 1}

_SHAPE_RE = re.compile(
    r"(?P<dt>[a-z0-9]+)\[(?P<dims>[0-9,]*)\]"
    r"(?:\{(?P<mtm>[0-9,]+)(?::T\((?P<tile>[0-9,]+)\)"
    r"(?:\((?P<pack>[0-9,]+)\))?[^}]*)?\})?")


def _ceil_to(n: int, m: int) -> int:
    return (n + m - 1) // m * m


def padded_bytes(shape_str: str) -> int:
    """Physical HBM bytes of one shape literal with layout annotation."""
    m = _SHAPE_RE.match(shape_str)
    if not m or m.group("dt") not in _ITEMSIZE:
        return 0
    isz = _ITEMSIZE[m.group("dt")]
    dims = [int(d) for d in m.group("dims").split(",") if d] or [1]
    mtm = ([int(d) for d in m.group("mtm").split(",")]
           if m.group("mtm") else list(range(len(dims) - 1, -1, -1)))
    # physical order: major..minor
    phys = [dims[i] for i in reversed(mtm)]
    tile = ([int(t) for t in m.group("tile").split(",")]
            if m.group("tile") else None)
    if tile and len(tile) >= 2 and len(phys) >= 1:
        sub, lane = tile[-2], tile[-1]
        if m.group("pack"):
            sub *= int(m.group("pack").split(",")[0])
        phys[-1] = _ceil_to(phys[-1], lane)
        if len(phys) >= 2:
            phys[-2] = _ceil_to(phys[-2], sub)
        else:
            phys = [sub, phys[-1]]
    n = 1
    for d in phys:
        n *= d
    return n * isz


def logical_bytes(shape_str: str) -> int:
    m = _SHAPE_RE.match(shape_str)
    if not m or m.group("dt") not in _ITEMSIZE:
        return 0
    n = _ITEMSIZE[m.group("dt")]
    for d in (int(d) for d in m.group("dims").split(",") if d):
        n *= d
    return n


_INSTR_RE = re.compile(
    r"^\s+(?:ROOT\s+)?%(?P<name>[^ ]+) = (?P<shape>\([^)]*\)|[a-z0-9]+\["
    r"[^ ]*) (?P<op>[a-z0-9-]+)\((?P<operands>[^)]*)\)(?P<rest>.*)$")
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')
_TUPLE_SHAPE_RE = re.compile(r"[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?")


def audit(hlo_text: str):
    """Parse the ENTRY computation; return per-instruction traffic rows."""
    lines = hlo_text.splitlines()
    in_entry = False
    # output shape of every named value (for operand read accounting)
    shapes: dict[str, str] = {}
    rows = []
    for ln in lines:
        if ln.startswith("ENTRY "):
            in_entry = True
            continue
        if in_entry and ln.startswith("}"):
            break
        if not in_entry:
            continue
        m = _INSTR_RE.match(ln)
        if not m:
            continue
        name, shape, op = m.group("name"), m.group("shape"), m.group("op")
        shapes[name] = shape
        if op in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
            continue
        if shape.startswith("("):
            wr_pad = sum(padded_bytes(s) for s in
                         _TUPLE_SHAPE_RE.findall(shape))
            wr_log = sum(logical_bytes(s) for s in
                         _TUPLE_SHAPE_RE.findall(shape))
        else:
            wr_pad, wr_log = padded_bytes(shape), logical_bytes(shape)
        rd_pad = rd_log = 0
        for opnd in m.group("operands").split(","):
            opnd = opnd.strip().lstrip("%")
            # operands may carry inline shapes ("f32[..] %x") or bare names
            parts = opnd.split(" ")
            sh = None
            if len(parts) == 2 and "[" in parts[0]:
                sh = parts[0]
            else:
                sh = shapes.get(parts[-1])
            if sh and not sh.startswith("("):
                rd_pad += padded_bytes(sh)
                rd_log += logical_bytes(sh)
        kind = op
        rest = m.group("rest")
        if op == "fusion":
            km = re.search(r"kind=(\w+)", rest)
            kind = f"fusion:{km.group(1)}" if km else "fusion"
        onm = _OPNAME_RE.search(rest)
        rows.append({
            "name": name, "op": kind, "shape": shape.split("{")[0],
            "op_name": onm.group(1) if onm else "",
            "write_pad": wr_pad, "write_log": wr_log,
            "read_pad": rd_pad, "read_log": rd_log,
        })
    return rows


def _layer_of(op_name: str) -> str:
    # metadata like "jit(apply)/PCF_Seg/backbone/sa_layers_2/op" -> the
    # informative tail (skip the generic jit(...)/Module prefix)
    parts = [p for p in op_name.split("/")
             if p and not p.startswith("jit(")
             and p != "PointConvFormer_Segmentation"]
    return "/".join(parts[-3:])[:56] if parts else "?"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--by-layer", action="store_true")
    ap.add_argument("--wall-ms", type=float, default=None,
                    help="measured wall for GB/s (else timed here)")
    ap.add_argument("--dump", type=str, default=None,
                    help="write the scheduled HLO text here for offline "
                         "re-analysis (audit(open(f).read()))")
    ap.add_argument("--cm-geom", action="store_true",
                    help="audit with cfg.cm_geom (channel-major stage "
                         "geometry)")
    ap.add_argument("--resolve", choices=["xla", "pallas"], default="xla")
    args = ap.parse_args()

    import jax

    from __graft_entry__ import _flagship
    from pcf_tpu.models import PointConvFormer_Segmentation
    from pcf_tpu.utils.timing import readback_overhead, time_fn

    cfg, batch = _flagship(level0_points=20000, bucket=4096, n_scenes=2,
                           window_gather=True)
    cfg.window_gather = True
    cfg.compute_dtype = "bfloat16"
    cfg.cm_geom = args.cm_geom
    cfg.resolve_impl = args.resolve
    model = PointConvFormer_Segmentation(cfg)

    def apply(v, b, train, **kw):
        return model.apply(v, b.feats, list(b.points), list(b.edges_self),
                           list(b.edges_forward), list(b.edges_propagate),
                           list(b.norms), masks=list(b.masks), train=train,
                           **kw)

    variables = jax.jit(
        lambda k, b: model.init(
            k, b.feats, list(b.points), list(b.edges_self),
            list(b.edges_forward), list(b.edges_propagate), list(b.norms),
            masks=list(b.masks), train=False)
    )(jax.random.PRNGKey(0), batch)

    if args.train:
        from pcf_tpu.parallel import make_train_step
        from pcf_tpu.train.state import create_train_state, make_optimizer
        tx, _ = make_optimizer(cfg, iter_per_epoch=100)
        state = create_train_state(variables, tx)
        step = make_train_step(model, tx, cfg, mesh=None)
        rng = jax.random.PRNGKey(2)
        fn = jax.jit(step)
        lowered = fn.lower(state, batch, rng)
        run_args = (state, batch, rng)
    else:
        fn = jax.jit(lambda v, b: apply(v, b, False))
        lowered = fn.lower(variables, batch)
        run_args = (variables, batch)

    compiled = lowered.compile()
    hlo_text = compiled.as_text()
    if args.dump:
        with open(args.dump, "w") as f:
            f.write(hlo_text)
    rows = audit(hlo_text)

    if args.wall_ms is None:
        fn(*run_args)
        ov = readback_overhead()
        wall_ms = time_fn(fn, *run_args, iters=10, overhead=ov) * 1e3
    else:
        wall_ms = args.wall_ms

    tot_pad = sum(r["write_pad"] + r["read_pad"] for r in rows)
    tot_log = sum(r["write_log"] + r["read_log"] for r in rows)
    print(f"instructions: {len(rows)}  wall: {wall_ms:.2f} ms")
    print(f"total traffic (buffer-graph upper bound): "
          f"{tot_pad/2**30:.2f} GiB padded / {tot_log/2**30:.2f} GiB logical "
          f"(pad factor {tot_pad/max(tot_log,1):.2f}x)")
    print(f"implied bandwidth: {tot_pad/wall_ms*1e3/1e9:.0f} GB/s padded, "
          f"{tot_log/wall_ms*1e3/1e9:.0f} GB/s logical "
          f"(hbm_peak practical wall: ~550-780 GB/s)")

    key = (lambda r: _layer_of(r["op_name"])) if args.by_layer else (
        lambda r: r["op"])
    agg_pad, agg_log, agg_n = (defaultdict(int), defaultdict(int),
                               defaultdict(int))
    for r in rows:
        k = key(r)
        agg_pad[k] += r["write_pad"] + r["read_pad"]
        agg_log[k] += r["write_log"] + r["read_log"]
        agg_n[k] += 1
    print(f"\n{'group':<40} {'n':>5} {'padded MiB':>11} {'logical':>9} "
          f"{'pad x':>6} {'% of pad':>8}")
    for k in sorted(agg_pad, key=agg_pad.get, reverse=True)[:args.top]:
        print(f"{k:<40} {agg_n[k]:>5} {agg_pad[k]/2**20:>11.1f} "
              f"{agg_log[k]/2**20:>9.1f} "
              f"{agg_pad[k]/max(agg_log[k],1):>6.2f} "
              f"{100*agg_pad[k]/max(tot_pad,1):>7.1f}%")

    print("\ntop individual buffers (write+read, padded):")
    for r in sorted(rows, key=lambda r: r["write_pad"] + r["read_pad"],
                    reverse=True)[:args.top]:
        b = r["write_pad"] + r["read_pad"]
        print(f"  {b/2**20:8.1f} MiB  {r['op']:<16} {r['shape']:<28} "
              f"{_layer_of(r['op_name'])}")


if __name__ == "__main__":
    main()
