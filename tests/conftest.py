"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective paths are
validated on XLA's host-platform virtual devices instead (same SPMD
partitioner, same collectives).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# A sitecustomize pre-imports jax and pins jax_platforms to the TPU plugin;
# override it after import (backends are not initialized until first use).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (subprocess CLI runs, production-size "
        "scans, e2e pipelines). `pytest -m 'not slow'` gives a <3 min "
        "fast subset on a 1-core box; the full suite should run serially "
        "(~30 min single-core).",
    )
