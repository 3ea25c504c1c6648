"""Persistent-compilation-cache setup shared by the library entry points.

Library functions (trainer / simple eval / voting eval) must not clobber a
cache dir the user configured via JAX_COMPILATION_CACHE_DIR or a prior
jax.config call: an explicit cfg.compile_cache_dir wins, an existing
setting is respected, and only a fully unset cache falls back to the
default scratch dir.
"""

from __future__ import annotations

import os

_DEFAULT = "/tmp/pcf_tpu_jax_cache"


def enable_compile_cache(cfg=None) -> None:
    import jax

    explicit = cfg.get("compile_cache_dir") if cfg is not None else None
    if explicit:
        jax.config.update("jax_compilation_cache_dir", str(explicit))
    elif (jax.config.jax_compilation_cache_dir is None
          and not os.environ.get("JAX_COMPILATION_CACHE_DIR")):
        jax.config.update("jax_compilation_cache_dir", _DEFAULT)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
