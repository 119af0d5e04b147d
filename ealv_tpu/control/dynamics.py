"""Planner dynamics models — pure-function JAX re-design.

Behavioral parity targets: franka_test/scripts/control_torch/dynamics.py
(RK4 :7-13, BaseIntegratorEnv :16-65, SingleIntegratorEnv :67,
DoubleIntegratorEnv :81 with 0.8 velocity damping, DoubleIntegratorSpeedEnv
:97-142, DoubleIntegratorRollEnv :224-315).

TPU-first design: the reference's stateful nn.Module envs (mutable
``self.state``, ``self.R``) become frozen config objects whose methods are
pure functions over an explicit ``DynState`` pytree, so the planner can run
them inside ``lax.scan`` with zero host round-trips. The SO(3) roll model
replaces ``torch.matrix_exp`` with closed-form Rodrigues and carries its
rotation matrix in the state pytree instead of on the object.

State layout convention (matching the reference's usage): the state vector
is ``[positions..., velocities...]`` in the caller's state-string order;
``num_actions = num_states // 2`` for double integrators (accelerations).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import rotations as rot


class DynState(NamedTuple):
    """Carried planner-dynamics state.

    x: (num_states,) state vector.
    R: (3, 3) rotation matrix (identity and unused for non-roll models).
    """

    x: jax.Array
    R: jax.Array


def rk4_step(f, dt, x, u):
    """Classic RK4 integrator (parity: dynamics.py:7-13)."""
    k1 = dt * f(x, u)
    k2 = dt * f(x + k1 / 2.0, u)
    k3 = dt * f(x + k2 / 2.0, u)
    k4 = dt * f(x + k3, u)
    return x + (1.0 / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


@dataclasses.dataclass(frozen=True)
class _Base:
    num_states: int
    num_actions: int
    dt: float
    use_rk4: bool = True

    # ---- pure API used by the planner ----
    def init(self, x0) -> DynState:
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        x = jnp.zeros(self.num_states, jnp.float32).at[: x0.shape[0]].set(
            x0[: self.num_states]
        )
        return DynState(x=x, R=jnp.eye(3, dtype=jnp.float32))

    def _A(self, s: DynState):
        raise NotImplementedError

    def _B(self, s: DynState):
        raise NotImplementedError

    def get_lin(self, s: DynState, u):
        """(A, B) linearization at the carried state (parity: get_lin :39-41)."""
        return self._A(s), self._B(s)

    def f(self, s: DynState, x, u):
        """Continuous-time dynamics Ax + Bu (parity: f :54-56). ``x`` is
        passed separately so RK4 can evaluate at intermediate points while
        A, B stay frozen at the carried state, exactly like the reference
        (whose fdx/fdu ignore their x argument)."""
        A, B = self._A(s), self._B(s)
        return A @ x + B @ u

    def step(self, s: DynState, u) -> DynState:
        fn = lambda x, uu: self.f(s, x, uu)
        if self.use_rk4:
            x_new = rk4_step(fn, self.dt, s.x, u)
        else:
            x_new = s.x + fn(s.x, u) * self.dt
        return DynState(x=x_new, R=s.R)


@dataclasses.dataclass(frozen=True)
class SingleIntegrator(_Base):
    """xdot = u (parity: SingleIntegratorEnv, dynamics.py:67-79)."""

    def _A(self, s):
        return jnp.zeros((self.num_states, self.num_states), jnp.float32)

    def _B(self, s):
        return jnp.eye(self.num_actions, dtype=jnp.float32)


def _double_integrator_AB(num_actions: int, num_states: int, damping: float = 0.8):
    n, m = num_states, num_actions
    A = jnp.zeros((n, n), jnp.float32).at[:m, m : 2 * m].set(jnp.eye(m) * damping)
    B = jnp.zeros((n, m), jnp.float32).at[m : 2 * m, :].set(jnp.eye(m))
    return A, B


@dataclasses.dataclass(frozen=True)
class DoubleIntegrator(_Base):
    """[pos; vel], posdot = 0.8*vel, veldot = u (parity: dynamics.py:81-95,
    including the reference's 0.8 velocity damping in A)."""

    def _A(self, s):
        return _double_integrator_AB(self.num_actions, self.num_states)[0]

    def _B(self, s):
        return _double_integrator_AB(self.num_actions, self.num_states)[1]


@dataclasses.dataclass(frozen=True)
class DoubleIntegratorSpeed(_Base):
    """[pos; vel; |vel|] — extra speed-magnitude states (parity:
    dynamics.py:97-142). num_states = 3 * num_actions."""

    def _A(self, s):
        m = self.num_actions
        n = self.num_states
        return jnp.zeros((n, n), jnp.float32).at[:m, m : 2 * m].set(jnp.eye(m) * 0.8)

    def _B(self, s):
        m = self.num_actions
        n = self.num_states
        B = jnp.zeros((n, m), jnp.float32)
        B = B.at[m : 2 * m, :].set(jnp.eye(m))
        B = B.at[2 * m :, :].set(jnp.eye(m))
        # sign-modulated magnitude rows (parity: fdu :113-119)
        signs = jnp.sign(s.x[m : 2 * m])
        signs = jnp.where(signs == 0, 1.0, signs)
        mod = jnp.ones(n, jnp.float32).at[2 * m :].set(signs)
        return mod[:, None] * B

    def step(self, s: DynState, u) -> DynState:
        s2 = super().step(s, u)
        m = self.num_actions
        # force magnitude rows to |vel| (parity: step :121-130)
        x = s2.x.at[2 * m :].set(jnp.abs(s2.x[m : 2 * m]))
        return DynState(x=x, R=s2.R)

    def init(self, x0) -> DynState:
        x0 = jnp.asarray(x0, dtype=jnp.float32)
        m = self.num_actions
        s = super().init(x0)
        x = s.x
        if x0.shape[0] < self.num_states:
            x = x.at[2 * m :].set(jnp.abs(x[m : 2 * m]))
        return DynState(x=x, R=s.R)


@dataclasses.dataclass(frozen=True)
class DoubleIntegratorRoll(_Base):
    """Double integrator whose last three position states are SO(3) Euler
    angles, integrated on the group (parity: DoubleIntegratorRollEnv,
    dynamics.py:224-315).

    The rotation matrix R is carried in DynState; the linearization injects
    the Euler-rate Jacobian block (B(r,p) @ R) at [rpw, d_rpw]
    (parity: get_B :189-211, fdx :283-289), and ``step`` overrides the Euler
    states with wrap(matrix_to_euler(exp(hat(w) dt) @ R)) (parity: :291-301).

    ``rpw``: indices of (roll, pitch, yaw) inside the position block.
    ``angle_scale``/``angle_shift``: optional affine map from planner
    ("robot") angle coordinates to real angles, replacing the reference's
    Lambda(ws_conversion) hooks (klerg.py:148-149).
    """

    rpw: tuple = (0, 1, 2)
    angle_scale: tuple = (1.0, 1.0, 1.0)
    angle_shift: tuple = (0.0, 0.0, 0.0)

    def _rpw(self):
        return jnp.asarray(self.rpw, dtype=jnp.int32)

    def _d_rpw(self):
        return self._rpw() + self.num_actions

    def to_angles(self, v):
        """planner coords -> real angles."""
        return v * jnp.asarray(self.angle_scale) + jnp.asarray(self.angle_shift)

    def from_angles(self, a):
        return (a - jnp.asarray(self.angle_shift)) / jnp.asarray(self.angle_scale)

    def _A(self, s):
        A = _double_integrator_AB(self.num_actions, self.num_states)[0]
        ang = self.to_angles(s.x[self._rpw()])
        Bj = rot._mm(rot.euler_rate_jacobian(ang), s.R)
        return A.at[jnp.ix_(self._rpw(), self._d_rpw())].set(Bj)

    def _B(self, s):
        return _double_integrator_AB(self.num_actions, self.num_states)[1]

    def step(self, s: DynState, u) -> DynState:
        s2 = super().step(s, u)
        w = s.x[self._d_rpw()]
        # full-precision 3x3 compose: bf16 MXU passes here accumulate ~1e-2
        # orthonormality drift over a 10-step horizon
        R_new = rot._mm(rot.so3_exp(w * self.dt), s.R)
        new_rot = rot.wrap_angles(rot.matrix_to_euler_angles(R_new))
        x = s2.x.at[self._rpw()].set(self.from_angles(new_rot))
        return DynState(x=x, R=R_new)

    def init(self, x0) -> DynState:
        s = super().init(x0)
        ang = self.to_angles(s.x[self._rpw()])
        return DynState(x=s.x, R=rot.euler_angles_to_matrix(ang))


def make_dynamics(
    states: str,
    dt: float,
    use_magnitude: bool = False,
    use_rk4: bool = True,
    angle_scale=None,
    angle_shift=None,
):
    """Pick the dynamics model from the (position) state string, mirroring
    the selection logic in klerg.py:143-157.

    ``states`` here is the position state string (e.g. 'xyz', 'xyzrpw');
    more than one of 'rpw' present -> SO(3) roll model; ``use_magnitude`` ->
    speed-augmented model; otherwise plain double integrator.
    """
    n_pos = len(states)
    rot_count = sum(c in "rpw" for c in states)
    if rot_count > 1:
        rpw = tuple(i for i, c in enumerate(states) if c in "rpw")
        if len(rpw) != 3:
            raise ValueError(f"roll dynamics need all of r, p, w; got {states!r}")
        kw = {}
        if angle_scale is not None:
            kw["angle_scale"] = tuple(angle_scale)
        if angle_shift is not None:
            kw["angle_shift"] = tuple(angle_shift)
        return DoubleIntegratorRoll(
            num_states=2 * n_pos, num_actions=n_pos, dt=dt, use_rk4=use_rk4,
            rpw=rpw, **kw,
        )
    if use_magnitude:
        return DoubleIntegratorSpeed(
            num_states=3 * n_pos, num_actions=n_pos, dt=dt, use_rk4=use_rk4
        )
    return DoubleIntegrator(
        num_states=2 * n_pos, num_actions=n_pos, dt=dt, use_rk4=use_rk4
    )
