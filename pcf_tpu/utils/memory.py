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


def compiled_memory_gib(compiled) -> dict | None:
    """Static HBM footprint (GiB) of one compiled XLA executable.

    XLA allocates a program's buffers ahead of time, so the compiled
    executable's memory analysis IS the peak for that program — exact and
    available even where the PJRT allocator exposes no runtime stats (e.g.
    proxied devices, where memory_stats() returns None). `total_gib` is
    args + outputs + temps − donated/aliased: the high-water mark while the
    program runs, excluding anything else resident in HBM.
    """
    try:
        ma = compiled.memory_analysis()
        gib = 1024 ** 3
        args = ma.argument_size_in_bytes
        out = ma.output_size_in_bytes
        temp = ma.temp_size_in_bytes
        alias = ma.alias_size_in_bytes
    except Exception:
        return None
    return {
        "args_gib": args / gib,
        "output_gib": out / gib,
        "temp_gib": temp / gib,
        "total_gib": (args + out + temp - alias) / gib,
    }
