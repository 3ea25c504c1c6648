"""Device timing that is robust to lazy/relayed execution.

On this environment's axon-relayed TPU, `block_until_ready()` does not
reliably round-trip, and a host readback costs ~30ms regardless of the
computation — so the only sound protocol is:

  t_per_iter = (T(n dispatches + readback of last output) - T(readback of a
               tiny op)) / n

The device executes dispatches in order on one stream, so the final readback
transitively waits for all n iterations.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _force(x):
    """Force full materialization via a scalar host readback."""
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].ravel()[:1]))


def readback_overhead(n: int = 5) -> float:
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.ones((8, 8))
    _force(f(x))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(f(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def time_fn_stats(f, *args, iters: int = 10, reps: int = 3,
                  overhead: float | None = None) -> dict:
    """Per-iteration wall seconds for f(*args): median + spread over reps.

    Returns {"median", "min", "max", "reps"} — the spread makes
    round-over-round deltas interpretable (byte-identical programs measure
    with ±1.5% run-to-run drift through the device relay, RESULTS.md r3;
    a headline without spread can't distinguish that from a regression)."""
    if overhead is None:
        overhead = readback_overhead()
    _force(f(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = f(*args)
        _force(out)
        ts.append(max((time.perf_counter() - t0 - overhead) / iters, 1e-9))
    ts.sort()
    return {"median": ts[len(ts) // 2], "min": ts[0], "max": ts[-1],
            "reps": ts}


def time_fn(f, *args, iters: int = 10, reps: int = 3,
            overhead: float | None = None) -> float:
    """Median-of-reps per-iteration wall seconds for f(*args)."""
    return time_fn_stats(f, *args, iters=iters, reps=reps,
                         overhead=overhead)["median"]
