"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (reference has no distributed test
harness at all — SURVEY.md §4; this CPU-mesh simulation is a deliberate
improvement so the sharded path is exercised in CI).
"""

import os
import sys

# The container's sitecustomize registers an axon (TPU-relay) PJRT hook in
# every interpreter, which slows XLA compiles even for the CPU backend
# (~3-8s wall per unique executable, mostly waiting). Tests are CPU-only by
# design, so re-exec pytest once with the axon env stripped — cuts the suite
# time ~6x. Done in pytest_configure so global output capture can be stopped
# first (exec would otherwise inherit pytest's captured fds and lose output).
def pytest_configure(config):
    if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get("PCF_TESTS_REEXEC") != "1":
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.stop_global_capturing()
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
        env["JAX_PLATFORMS"] = "cpu"
        flags = env.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            flags += " --xla_force_host_platform_device_count=8"
        env["XLA_FLAGS"] = flags
        env["PCF_TESTS_REEXEC"] = "1"
        sys.stdout.flush()
        sys.stderr.flush()
        os.execvpe(sys.executable, [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


os.environ["JAX_PLATFORMS"] = "cpu"
# Silence XLA:CPU AOT cache-loader machine-feature warnings (the persistent
# cache records prefer-no-scatter pseudo-features the loader doesn't list;
# benign but extremely noisy).
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax
import numpy as np
import pytest

# Persistent compilation cache: layer/model tests are compile-bound on CPU;
# cached executables make repeat CI runs fast.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("PCF_JAX_CACHE", "/tmp/pcf_tpu_jax_cache_cpu"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
