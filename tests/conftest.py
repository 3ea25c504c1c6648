"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (reference has no distributed test
harness at all — SURVEY.md §4; this CPU-mesh simulation is a deliberate
improvement so the sharded path is exercised in CI).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
