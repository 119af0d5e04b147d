import jax
import jax.numpy as jnp
import numpy as np

from ealv_tpu.control import (
    rk4_step,
    SingleIntegrator,
    DoubleIntegrator,
    DoubleIntegratorSpeed,
    DoubleIntegratorRoll,
    make_dynamics,
)
from ealv_tpu.utils import rotations as rot


class TestRK4:
    def test_exact_on_linear(self):
        # xdot = -x: RK4 matches exp(-dt) to O(dt^5)
        f = lambda x, u: -x
        x = jnp.array([1.0])
        out = rk4_step(f, 0.1, x, jnp.zeros(1))
        np.testing.assert_allclose(out, np.exp(-0.1), rtol=1e-7)


class TestDoubleIntegrator:
    def test_structure(self):
        dyn = DoubleIntegrator(num_states=4, num_actions=2, dt=0.1)
        s = dyn.init(jnp.zeros(4))
        A, B = dyn.get_lin(s, jnp.zeros(2))
        # reference: posdot = 0.8 * vel (dynamics.py:90)
        np.testing.assert_allclose(np.asarray(A)[:2, 2:], 0.8 * np.eye(2))
        np.testing.assert_allclose(np.asarray(A)[2:, :], 0.0)
        np.testing.assert_allclose(np.asarray(B)[2:, :], np.eye(2))

    def test_step_matches_manual_rk4(self, rng):
        dyn = DoubleIntegrator(num_states=4, num_actions=2, dt=0.2)
        x0 = rng.standard_normal(4).astype(np.float32)
        u = rng.standard_normal(2).astype(np.float32)
        s = dyn.init(jnp.array(x0))
        out = dyn.step(s, jnp.array(u)).x
        A = np.zeros((4, 4)); A[:2, 2:] = 0.8 * np.eye(2)
        B = np.zeros((4, 2)); B[2:] = np.eye(2)
        f = lambda x: A @ x + B @ u
        k1 = 0.2 * f(x0); k2 = 0.2 * f(x0 + k1 / 2); k3 = 0.2 * f(x0 + k2 / 2); k4 = 0.2 * f(x0 + k3)
        want = x0 + (k1 + 2 * k2 + 2 * k3 + k4) / 6
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)

    def test_euler_mode(self):
        dyn = DoubleIntegrator(num_states=2, num_actions=1, dt=0.1, use_rk4=False)
        s = dyn.init(jnp.array([0.0, 1.0]))
        out = dyn.step(s, jnp.array([0.0])).x
        np.testing.assert_allclose(out, [0.08, 1.0], rtol=1e-6)  # pos += 0.8*vel*dt


class TestSpeedEnv:
    def test_magnitude_override(self):
        dyn = DoubleIntegratorSpeed(num_states=6, num_actions=2, dt=0.1)
        s = dyn.init(jnp.array([0.0, 0.0, -0.5, 0.3]))
        # init fills |vel| rows
        np.testing.assert_allclose(s.x[4:], [0.5, 0.3], rtol=1e-6)
        s2 = dyn.step(s, jnp.array([1.0, -1.0]))
        np.testing.assert_allclose(s2.x[4:], np.abs(s2.x[2:4]), rtol=1e-6)

    def test_fdu_sign_modulation(self):
        dyn = DoubleIntegratorSpeed(num_states=6, num_actions=2, dt=0.1)
        s = dyn.init(jnp.array([0.0, 0.0, -0.5, 0.3]))
        B = np.asarray(dyn.get_lin(s, jnp.zeros(2))[1])
        np.testing.assert_allclose(B[4:, :], np.diag([-1.0, 1.0]))


class TestRollEnv:
    def _dyn(self):
        # states 'xyzrpw' -> positions xyz + angles rpw, rpw at indices 3,4,5
        return DoubleIntegratorRoll(num_states=12, num_actions=6, dt=0.05, rpw=(3, 4, 5))

    def test_rotation_integrates_on_group(self):
        dyn = self._dyn()
        x0 = np.zeros(12, np.float32)
        x0[9:12] = [0.0, 0.0, 0.7]  # pure yaw rate
        s = dyn.init(jnp.array(x0))
        for _ in range(10):
            s = dyn.step(s, jnp.zeros(6))
        # after 10 steps of pure yaw rate 0.7 for dt=0.05 with damped pos rows,
        # yaw angle from the group update = 0.7 * 0.5 = 0.35
        np.testing.assert_allclose(s.x[5], 0.35, atol=1e-4)
        R = np.asarray(s.R)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)

    def test_fdx_injects_euler_rate_block(self):
        dyn = self._dyn()
        x0 = np.zeros(12, np.float32)
        x0[3:6] = [0.3, 0.2, 0.1]
        s = dyn.init(jnp.array(x0))
        A = np.asarray(dyn.get_lin(s, jnp.zeros(6))[0])
        want = np.asarray(rot.euler_rate_jacobian(jnp.array(x0[3:6])) @ s.R)
        np.testing.assert_allclose(A[3:6, 9:12], want, atol=1e-5)
        # non-rotation rows keep the damped double-integrator structure
        np.testing.assert_allclose(A[:3, 6:9], 0.8 * np.eye(3))

    def test_angle_conversion_hooks(self):
        # planner coords scaled by 2 + shifted: angles = 2*v + 0.5
        dyn = DoubleIntegratorRoll(
            num_states=12, num_actions=6, dt=0.05, rpw=(3, 4, 5),
            angle_scale=(2.0, 2.0, 2.0), angle_shift=(0.5, 0.5, 0.5),
        )
        v = jnp.array([0.1, 0.2, 0.3])
        np.testing.assert_allclose(dyn.from_angles(dyn.to_angles(v)), v, rtol=1e-6)


class TestFactory:
    def test_selection(self):
        assert isinstance(make_dynamics("xy", 0.1), DoubleIntegrator)
        assert isinstance(make_dynamics("xy", 0.1, use_magnitude=True), DoubleIntegratorSpeed)
        assert isinstance(make_dynamics("xyzrpw", 0.1), DoubleIntegratorRoll)

    def test_roll_requires_all_angles(self):
        import pytest
        with pytest.raises(ValueError):
            make_dynamics("xrp", 0.1)
