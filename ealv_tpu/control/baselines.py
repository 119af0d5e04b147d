"""Baseline exploration controllers (method-comparison matrix).

Parity target: DummyRobot (franka_test/scripts/control/dummy_robot.py:22-326)
— selected when explr_method is not a *klerg variant
(sensor_main_module.py:90-93):
  - 'randomWalk': smoothed random velocity with boundary rejection — draw a
    uniform control, average with the last one, reject up to 10 candidates
    that leave the (buffered) workspace, teleport uniformly if stuck
    (dummy_robot.py:137-151).
  - 'uniform': teleport to a uniform pose each step; velocity is the clipped
    finite difference (:152-156).

The 'unifklerg' baseline is the ergodic planner with a uniform target
(KlergConfig.uniform_tdist). Jit-friendly: the 10-candidate rejection loop
is one vectorized draw + first-valid select.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..data.replay import TrajMemory


class BaselineState(NamedTuple):
    x: jax.Array  # (n_pos,) position state
    last_vel: jax.Array  # (n_pos,)
    memory: TrajMemory
    key: jax.Array


@dataclasses.dataclass(frozen=True)
class BaselineController:
    """Same duck-typed step/save_update surface as the ergodic planner."""

    method: str  # 'randomWalk' | 'uniform'
    dt: float
    robot_lim: tuple  # ((lo, hi) x n_pos)
    robot_ctrl_lim: tuple  # ((lo, hi) x n_pos)
    buffer_capacity: int = 3000
    boundary_buffer: float = 0.05
    n_trials: int = 10

    def _lims(self):
        return jnp.asarray(self.robot_lim, jnp.float32)

    def _ctrl(self):
        return jnp.asarray(self.robot_ctrl_lim, jnp.float32)

    @property
    def n_pos(self) -> int:
        return len(self.robot_lim)

    def init_state(self, x0, seed: int = 0) -> BaselineState:
        x0 = jnp.asarray(x0, jnp.float32)[: self.n_pos]
        return BaselineState(
            x=x0,
            last_vel=jnp.zeros(self.n_pos, jnp.float32),
            memory=TrajMemory.create(self.buffer_capacity, 2 * self.n_pos),
            key=jax.random.PRNGKey(seed),
        )

    def step(self, bs: BaselineState):
        """Returns (state', full_state (pos+vel), vel)."""
        key, k1, k2 = jax.random.split(bs.key, 3)
        lims = self._lims()
        ctrl = self._ctrl()
        old = bs.x

        if self.method == "randomWalk":
            # 10 candidate smoothed velocities, take the first staying inside
            cands = jax.random.uniform(
                k1, (self.n_trials, self.n_pos),
                minval=ctrl[:, 0], maxval=ctrl[:, 1],
            )
            vels = (bs.last_vel[None, :] + cands) / 2.0
            states = old[None, :] + vels * self.dt  # single integrator
            b = self.boundary_buffer
            valid = jnp.all(
                (states >= lims[:, 0] + b) & (states <= lims[:, 1] - b), axis=1
            )
            any_valid = jnp.any(valid)
            first = jnp.argmax(valid)
            state_v = states[first]
            vel_v = vels[first]
            # stuck fallback: uniform teleport (dummy_robot.py:148-151)
            state_u = jax.random.uniform(k2, (self.n_pos,),
                                         minval=lims[:, 0], maxval=lims[:, 1])
            vel_u = jnp.clip((state_u - old) / self.dt, ctrl[:, 0], ctrl[:, 1])
            state = jnp.where(any_valid, state_v, state_u)
            vel = jnp.where(any_valid, vel_v, vel_u)
        elif self.method == "uniform":
            state = jax.random.uniform(k1, (self.n_pos,),
                                       minval=lims[:, 0], maxval=lims[:, 1])
            vel = jnp.clip((state - old) / self.dt, ctrl[:, 0], ctrl[:, 1])
        else:
            raise ValueError(f"unknown baseline method {self.method!r}")

        full = jnp.concatenate([state, vel])
        bs = bs._replace(x=state, last_vel=vel, key=key)
        return bs, full, vel

    def save_update(self, bs: BaselineState, full_state, save: bool = True):
        """Sync to a measured state + record it (parity: dummy_robot
        save_update)."""
        full_state = jnp.asarray(full_state, jnp.float32)
        bad = jnp.any(jnp.isnan(full_state))
        x_new = jnp.where(bad, bs.x, full_state[: self.n_pos])
        memory = bs.memory
        if save:
            pushed = memory.push(jnp.nan_to_num(full_state[: 2 * self.n_pos]))
            memory = jax.tree.map(lambda a, b: jnp.where(bad, a, b), memory, pushed)
        return bs._replace(x=x_new, memory=memory)
