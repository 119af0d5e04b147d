"""Default (warm-start) policies for the KL-ergodic planner.

Parity target: franka_test/scripts/control_torch/default_policies.py
(Roll :5, Zero :30, BarrierPush :53, LQR :100).

The reference's policies are stateful iterators over the control sequence;
inside the planner's forward pass they all reduce to a pure function of
(x_t, nominal u_t). We expose exactly that:

  - ``act(x, u_t) -> u_eff``      control actually applied at this step
  - ``dx(x, u_t)  -> dmu/dx``     (num_actions, num_states) Jacobian
  - ``shift(u, idx) -> u``        the ``reset`` warm-start transform; called
                                  with negative idx after a measured state
                                  update (klerg.py:319) and with the inner-
                                  iteration index during planning.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RollPolicy:
    """Replay the nominal controls; on state update, roll the sequence
    forward and zero the tail (parity: Roll.reset :13-18)."""

    num_actions: int
    num_states: int

    def act(self, x, u_t):
        return u_t

    def dx(self, x, u_t):
        return jnp.zeros((self.num_actions, self.num_states), jnp.float32)

    def shift(self, u, idx: int):
        if idx >= 0:
            return u
        rolled = jnp.roll(u, idx, axis=0)
        h = u.shape[0]
        t = jnp.arange(h)
        return jnp.where((t >= h + idx)[:, None], 0.0, rolled)


@dataclasses.dataclass(frozen=True)
class ZeroPolicy:
    """Replay nominal controls; zero everything on state update
    (parity: Zero.reset :38-42)."""

    num_actions: int
    num_states: int

    def act(self, x, u_t):
        return u_t

    def dx(self, x, u_t):
        return jnp.zeros((self.num_actions, self.num_states), jnp.float32)

    def shift(self, u, idx: int):
        return jnp.zeros_like(u) if idx < 0 else u


@dataclasses.dataclass(frozen=True)
class BarrierPushPolicy:
    """Damp velocity when a position state is at its bound and still moving
    outward: u_i = -weight * vel_i, with the matching analytic
    dmu/dx[i, i+m] = -weight (parity: BarrierPush :71-90).

    Note reference quirk kept: during planning iterations with idx == 0 the
    nominal controls are ignored (reset returns an empty iterator ->
    zeros); we reproduce it in ``shift``'s ``zero_on_first`` return.
    """

    num_actions: int
    num_states: int
    weight: float = 5.0
    b_lo: float = -1.0
    b_hi: float = 1.0

    def _active(self, x):
        m = self.num_actions
        pos, vel = x[:m], x[m : 2 * m]
        return ((pos >= self.b_hi) & (vel > 0)) | ((pos <= self.b_lo) & (vel < 0))

    def act(self, x, u_t):
        m = self.num_actions
        vel = x[m : 2 * m]
        return jnp.where(self._active(x), -self.weight * vel, u_t)

    def dx(self, x, u_t):
        m = self.num_actions
        base = jnp.zeros((m, self.num_states), jnp.float32)
        rows = jnp.arange(m)
        return base.at[rows, rows + m].set(
            jnp.where(self._active(x), -self.weight, 0.0)
        )

    def shift(self, u, idx: int):
        return jnp.zeros_like(u) if idx <= 0 else u


@dataclasses.dataclass(frozen=True)
class LQRPolicy:
    """u = -K x with K from the continuous ARE (parity: LQR :100-119).

    K is computed once at build time on the host (scipy) — it depends only
    on the constant (A, B) of the linear dynamics — then baked in as a
    constant for the jitted planner.
    """

    num_actions: int
    num_states: int
    K: tuple  # row-major (m, n) gains, hashable for jit staticness

    @classmethod
    def create(cls, dyn, horizon: int):
        import numpy as np
        from scipy.linalg import solve_continuous_are

        s0 = dyn.init(jnp.ones(dyn.num_states))
        A, B = dyn.get_lin(s0, jnp.ones(dyn.num_actions))
        A, B = np.asarray(A, np.float64), np.asarray(B, np.float64)
        m = dyn.num_actions
        Q = np.diag([5.0] * m + [1.0] * (dyn.num_states - m))
        R = np.eye(m) * 100.0 * horizon
        P = solve_continuous_are(A, B, Q, R, balanced=False)
        K = np.linalg.inv(R) @ B.T @ P
        return cls(num_actions=m, num_states=dyn.num_states, K=tuple(map(tuple, K)))

    def _K(self):
        return jnp.asarray(self.K, jnp.float32)

    def act(self, x, u_t):
        return -self._K() @ x

    def dx(self, x, u_t):
        return -self._K()

    def shift(self, u, idx: int):
        return u


def make_policy(name: str, dyn, horizon: int):
    """Policy factory (parity: klerg.py:200-201 ``eval(self.DefaultPolicy)``)."""
    if name == "Roll":
        return RollPolicy(dyn.num_actions, dyn.num_states)
    if name == "Zero":
        return ZeroPolicy(dyn.num_actions, dyn.num_states)
    if name == "BarrierPush":
        return BarrierPushPolicy(dyn.num_actions, dyn.num_states)
    if name == "LQR":
        return LQRPolicy.create(dyn, horizon)
    raise ValueError(f"unknown default policy {name!r}")
