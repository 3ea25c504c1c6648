"""Attic: completed investigations kept for provenance, out of the hot tree.

Code here is parity-tested and importable but retired from the production
dispatch surface — each module carries the measurement that retired it and
the analysis that closed its follow-ups. Nothing under `pcf_tpu.attic` is a
default code path.

Contents:
  eval_kernel.py — the whole-layer inference megakernel (r3), measured on
    chip in r4 at 0.247x the XLA path and closed in r5 (v3 infeasible /
    uneconomic on this toolchain — see its module docstring and
    benchmarks/RESULTS.md "Round 5: megakernel v3").
"""
