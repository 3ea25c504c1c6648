"""Device-memory observability — the reference's memory meters, TPU-native.

The reference logs torch.cuda.max_memory_reserved per print-freq
(train_ScanNet_DDP_WarmUP.py:471) and ships a per-kernel-path peak-memory
profiler (cpp_wrappers/cpp_pcf_kernel/profile.py:147-222). The JAX analog is
PJRT device memory_stats: bytes_in_use / peak_bytes_in_use / bytes_limit.

Caveat: peak_bytes_in_use is the allocator's high-water mark since process
start and cannot be reset — to attribute a peak to one workload, measure it
in a fresh process (benchmarks/model_bench.py --pallas on/off runs) or
compare before/after deltas for bytes_in_use.
"""

from __future__ import annotations


def hbm_stats(device=None) -> dict | None:
    """Raw memory_stats of a device, or None where unsupported (CPU)."""
    import jax

    d = device if device is not None else jax.devices()[0]
    try:
        stats = d.memory_stats()
    except Exception:
        return None
    return dict(stats) if stats else None


def hbm_summary(device=None) -> str:
    """'in_use/peak/limit' GiB one-liner for logs; '' where unsupported."""
    s = hbm_stats(device)
    if not s:
        return ""
    gib = 1024 ** 3
    in_use = s.get("bytes_in_use", 0) / gib
    peak = s.get("peak_bytes_in_use", 0) / gib
    limit = s.get("bytes_limit", 0) / gib
    return f"HBM {in_use:.2f}/{peak:.2f}/{limit:.2f} GiB (in-use/peak/limit)"


def hbm_peak_gib(device=None) -> float | None:
    s = hbm_stats(device)
    if not s or "peak_bytes_in_use" not in s:
        return None
    return s["peak_bytes_in_use"] / 1024 ** 3
