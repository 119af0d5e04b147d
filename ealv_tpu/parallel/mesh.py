"""Device mesh construction.

TPU replacement for the reference's distributed setup (dist_modules/
trainer_ddp.py:22-56: oneCCL/gloo/nccl process groups over localhost TCP,
plus the CPU-affinity/NUMA machinery of utils.py:125-271, which is obsolete
under XLA — the runtime owns placement).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (default: all).

    DP rides this axis; collectives ride ICI on real multi-chip slices.
    """
    devs = jax.devices()
    if n_devices is not None:
        if n_devices > len(devs):
            raise ValueError(
                f"requested {n_devices} devices but only {len(devs)} available "
                "(use XLA_FLAGS=--xla_force_host_platform_device_count=N on CPU)"
            )
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))
