"""Workspace barrier functions with analytic gradients.

Parity target: franka_test/scripts/control_torch/barrier.py
(setup_barrier :8-37, BarrierFunction :40-90, NoBarrier :147).

TPU-first: the limits live in an array field of a small pytree (so
``update_lims`` — used by the fingerprint capture stage to shrink the
workspace, klerg.py:253-263 — is a functional ``dataclasses.replace``
with no recompilation), and the batched penalty is a vmap instead of a
Python list comprehension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class BarrierFunction:
    """Polynomial boundary penalty.

    barr(x) = sum_i 1[x_i outside lim_i] * w_i * (x_i - lim_i)^p_i
    evaluated against both the lower and upper (buffered) limits.
    """

    b_lim: jax.Array  # (n, 2) buffered limits
    barr_weight: jax.Array  # (n,)
    power: jax.Array  # (n,)

    @classmethod
    def create(cls, b_lim, barr_weight, power, b_buff: float = 0.1):
        b_lim = jnp.asarray(b_lim, jnp.float32)
        b_lim = b_lim.at[:, 0].add(b_buff).at[:, 1].add(-b_buff)
        n = b_lim.shape[0]
        return cls(
            b_lim=b_lim,
            barr_weight=jnp.broadcast_to(jnp.asarray(barr_weight, jnp.float32), (n,)),
            power=jnp.broadcast_to(jnp.asarray(power, jnp.float32), (n,)),
        )

    def update_lims(self, b_lim, b_buff: float = 0.1):
        b_lim = jnp.asarray(b_lim, jnp.float32)
        b_lim = b_lim.at[:, 0].add(b_buff).at[:, 1].add(-b_buff)
        return self.replace(b_lim=b_lim)

    def truncate(self, n: int) -> "BarrierFunction":
        """Keep only the first n limit rows (parity: update_ergodic_dim,
        barrier.py:64-68 — used by clustering to penalize position dims
        only, clustering.py:110)."""
        return self.replace(
            b_lim=self.b_lim[:n],
            barr_weight=self.barr_weight[:n],
            power=self.power[:n],
        )

    def _terms(self, x):
        n = self.b_lim.shape[0]
        xc = x[:n]
        below = xc <= self.b_lim[:, 0]
        above = xc >= self.b_lim[:, 1]
        d_lo = xc - self.b_lim[:, 0]
        d_hi = xc - self.b_lim[:, 1]
        return xc, below, above, d_lo, d_hi

    def barr(self, x):
        """Scalar penalty at one state (parity: barrier.py:70-75)."""
        _, below, above, d_lo, d_hi = self._terms(x)
        t = jnp.where(below, self.barr_weight * d_lo**self.power, 0.0)
        t = t + jnp.where(above, self.barr_weight * d_hi**self.power, 0.0)
        return jnp.sum(t)

    def dbarr(self, x):
        """Analytic gradient, zero beyond the limit rows (parity: :77-84)."""
        n = self.b_lim.shape[0]
        _, below, above, d_lo, d_hi = self._terms(x)
        g = jnp.where(below, self.power * self.barr_weight * d_lo ** (self.power - 1), 0.0)
        g = g + jnp.where(above, self.power * self.barr_weight * d_hi ** (self.power - 1), 0.0)
        return jnp.zeros_like(x).at[:n].set(g)

    def batch(self, X):
        """Penalty for a trajectory (T, n_states) (parity: __call__ :86-87)."""
        return jax.vmap(self.barr)(X)


@struct.dataclass
class TiltBarrierFunction:
    """Cone constraint on end-effector tilt (parity: TiltBarrierFunction,
    barrier.py:95-144): penalizes tilt = arccos(cos r * cos p) when it drops
    BELOW tilt_lim (the camera must stay pointed down within a cone), with
    the analytic gradients of :126-138, stacked on an inner barrier.

    ``r_idx``/``p_idx`` locate roll/pitch in the state vector;
    ``angle_scale``/``angle_shift`` replace the reference's
    rot_to_angles_fn ws-conversion hook.
    """

    inner: BarrierFunction
    r_idx: int = struct.field(pytree_node=False, default=0)
    p_idx: int = struct.field(pytree_node=False, default=1)
    tilt_lim: float = struct.field(pytree_node=False, default=2.45)
    power: float = struct.field(pytree_node=False, default=4.0)
    weight: float = struct.field(pytree_node=False, default=10.0)
    angle_scale: tuple = struct.field(pytree_node=False, default=(1.0, 1.0))
    angle_shift: tuple = struct.field(pytree_node=False, default=(0.0, 0.0))

    def _angles(self, x):
        sc = jnp.asarray(self.angle_scale)
        sh = jnp.asarray(self.angle_shift)
        return jnp.stack([x[self.r_idx], x[self.p_idx]]) * sc + sh

    def _tilt(self, x):
        r, p = self._angles(x)
        return jnp.arccos(jnp.clip(jnp.cos(r) * jnp.cos(p), -1.0, 1.0)), r, p

    def barr(self, x):
        tilt, _, _ = self._tilt(x)
        active = (tilt <= self.tilt_lim).astype(jnp.float32)
        t = active * self.weight * (tilt - self.tilt_lim) ** self.power
        return t + self.inner.barr(x)

    def dbarr(self, x):
        tilt, r, p = self._tilt(x)
        active = (tilt <= self.tilt_lim).astype(jnp.float32)
        coeff = active * self.power * self.weight * (tilt - self.tilt_lim) ** (
            self.power - 1
        )
        denom = jnp.sqrt(jnp.maximum(1.0 - jnp.cos(p) ** 2 * jnp.cos(r) ** 2, 1e-9))
        g = jnp.zeros_like(x)
        sc = jnp.asarray(self.angle_scale)
        g = g.at[self.r_idx].add(coeff * jnp.sin(r) * jnp.cos(p) / denom * sc[0])
        g = g.at[self.p_idx].add(coeff * jnp.sin(p) * jnp.cos(r) / denom * sc[1])
        return g + self.inner.dbarr(x)

    def batch(self, X):
        return jax.vmap(self.barr)(X)

    def update_lims(self, b_lim, b_buff: float = 0.1):
        return self.replace(inner=self.inner.update_lims(b_lim, b_buff))

    def truncate(self, n: int):
        return self.replace(inner=self.inner.truncate(n))


@struct.dataclass
class NoBarrier:
    """Disabled barrier with the same pure API (parity: barrier.py:147-159)."""

    def barr(self, x):
        return jnp.zeros((), jnp.float32)

    def dbarr(self, x):
        return jnp.zeros_like(x)

    def batch(self, X):
        return jnp.zeros(X.shape[0], jnp.float32)

    def update_lims(self, b_lim, b_buff: float = 0.1):
        return self

    def truncate(self, n: int) -> "NoBarrier":
        return self


def setup_barrier(
    states: str,
    robot_lim,
    robot_ctrl_lim,
    non_vel_locs,
    use_barrier: bool = True,
    position_barrier: bool = True,
    velocity_barrier: bool = True,
    barr_weight: float = 5.0,
    b_buff: float = 0.1,
):
    """Build the barrier from config, mirroring setup_barrier
    (barrier.py:8-37): limits are [position lims; control lims], power 4
    everywhere, and the weight vector zeroes the block the config disables.

    Returns (barrier, barr_lim).
    """
    robot_lim = jnp.asarray(robot_lim, jnp.float32)
    robot_ctrl_lim = jnp.asarray(robot_ctrl_lim, jnp.float32)
    barr_lim = jnp.concatenate([robot_lim[jnp.asarray(non_vel_locs)], robot_ctrl_lim], 0)
    if not use_barrier:
        return NoBarrier(), barr_lim
    n = len(states)
    power = [4.0] * (2 * n)
    if position_barrier and not velocity_barrier:
        weights = [barr_weight] * n + [0.0] * n
    elif velocity_barrier and not position_barrier:
        weights = [0.0] * n + [barr_weight] * n
    else:
        weights = [barr_weight] * (2 * n)
    return (
        BarrierFunction.create(barr_lim, jnp.asarray(weights), jnp.asarray(power), b_buff),
        barr_lim,
    )
