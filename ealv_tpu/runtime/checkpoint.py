"""Checkpoint / resume via orbax.

Parity targets: the reference's model snapshots (model_final_{N}steps.pth /
model_postexplr.pth + optimizer state, trainer_module.py:613-672;
sensor_main_module.py:269-308) and the explr_update_info/data pickles that
make downstream stages resumable (SURVEY.md §5).

Improvement over the reference (which cannot resume mid-exploration): the
WHOLE ExperimentState pytree — params, optimizer, replay ring, planner
state, env state, schedules, RNG — checkpoints atomically, so a run resumes
exactly where it stopped.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(path: str, state: Any, step: int | None = None) -> str:
    """Save a pytree checkpoint. Returns the checkpoint directory."""
    path = _path(path)
    if step is not None:
        path = os.path.join(path, f"step_{step:07d}")
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)
    return path


def load_checkpoint(path: str, example_state: Any) -> Any:
    """Restore a pytree checkpoint into the structure of ``example_state``."""
    path = _path(path)
    with ocp.StandardCheckpointer() as ckptr:
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, example_state)
        return ckptr.restore(path, abstract)


def latest_checkpoint(base: str) -> str | None:
    """Most recent step_* checkpoint under ``base``, if any."""
    base = _path(base)
    if not os.path.isdir(base):
        return None
    steps = sorted(d for d in os.listdir(base) if d.startswith("step_"))
    return os.path.join(base, steps[-1]) if steps else None


def save_run_config(dir_path: str, cfg) -> None:
    """Dump the frozen experiment config into the run dir (parity:
    load_config.py:193-200 config.yaml dump; json here)."""
    import dataclasses

    os.makedirs(dir_path, exist_ok=True)
    d = dataclasses.asdict(cfg)
    with open(os.path.join(dir_path, "config.json"), "w") as f:
        json.dump(d, f, indent=2, default=str)
