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

# Persistent compilation cache: the smoke tier is compile-bound on a 1-core
# box; warm runs skip the XLA:CPU compiles entirely (~4 min -> well under 3).
_cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      ".jax_cache_tests")
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running test (subprocess CLI runs, production-size "
        "scans, e2e pipelines, torch-reference step matching). "
        "`pytest -m 'not slow'` gives a ~3 min smoke tier on a 1-core "
        "box; the full suite should run serially (~30 min single-core).",
    )
