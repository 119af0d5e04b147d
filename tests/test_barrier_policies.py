import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealv_tpu.control import (
    BarrierFunction,
    NoBarrier,
    setup_barrier,
    RollPolicy,
    ZeroPolicy,
    BarrierPushPolicy,
    LQRPolicy,
    make_policy,
    DoubleIntegrator,
)


class TestBarrier:
    def _barrier(self):
        lims = jnp.array([[-1.0, 1.0], [-1.0, 1.0]])
        return BarrierFunction.create(lims, 5.0, 4.0, b_buff=0.1)

    def test_zero_inside(self):
        b = self._barrier()
        assert float(b.barr(jnp.array([0.0, 0.0]))) == 0.0
        np.testing.assert_allclose(b.dbarr(jnp.array([0.5, -0.5])), 0.0)

    def test_value_outside(self):
        b = self._barrier()
        # buffered upper lim is 0.9; x=1.1 -> 5 * 0.2^4
        got = float(b.barr(jnp.array([1.1, 0.0])))
        np.testing.assert_allclose(got, 5 * 0.2**4, rtol=1e-4)

    def test_grad_matches_autodiff(self):
        b = self._barrier()
        x = jnp.array([1.3, -1.2])
        want = jax.grad(lambda xx: b.barr(xx))(x)
        np.testing.assert_allclose(b.dbarr(x), want, rtol=1e-4)

    def test_grad_zero_beyond_limit_rows(self):
        b = self._barrier()
        g = np.asarray(b.dbarr(jnp.array([1.5, 0.0, 99.0, 99.0])))
        assert g[2] == 0 and g[3] == 0

    def test_batch(self):
        b = self._barrier()
        X = jnp.array([[0.0, 0.0], [1.1, 0.0]])
        out = np.asarray(b.batch(X))
        assert out[0] == 0 and out[1] > 0

    def test_update_lims(self):
        b = self._barrier()
        b2 = b.update_lims(jnp.array([[-0.5, 0.5], [-0.5, 0.5]]))
        assert float(b2.barr(jnp.array([0.45, 0.0]))) > 0  # buffered lim 0.4
        assert float(b.barr(jnp.array([0.45, 0.0]))) == 0

    def test_setup_weights_layout(self):
        robot_lim = jnp.array([[-1.0, 1.0], [-1.0, 1.0]])
        ctrl_lim = jnp.array([[-1.25, 1.25], [-1.25, 1.25]])
        b, barr_lim = setup_barrier(
            "xy", robot_lim, ctrl_lim, [0, 1],
            position_barrier=True, velocity_barrier=False,
        )
        np.testing.assert_allclose(np.asarray(b.barr_weight), [5, 5, 0, 0])
        assert barr_lim.shape == (4, 2)

    def test_tilt_barrier(self):
        from ealv_tpu.control import TiltBarrierFunction
        inner = BarrierFunction.create(jnp.array([[-1.0, 1.0]] * 4), 0.0, 4.0)
        tb = TiltBarrierFunction(inner=inner, r_idx=0, p_idx=1, tilt_lim=2.45)
        # camera pointing straight down: roll=pi -> tilt=arccos(-1)=pi > lim: inactive
        x_down = jnp.array([jnp.pi, 0.0, 0.0, 0.0])
        assert float(tb.barr(x_down)) == 0.0
        # level camera: tilt=0 < lim -> penalized
        x_level = jnp.array([0.1, 0.1, 0.0, 0.0])
        assert float(tb.barr(x_level)) > 0
        # analytic gradient matches autodiff
        g = tb.dbarr(x_level)
        want = jax.grad(lambda xx: tb.barr(xx))(x_level)
        np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=1e-3,
                                   atol=1e-5)

    def test_no_barrier(self):
        b, _ = setup_barrier("xy", jnp.ones((2, 2)), jnp.ones((2, 2)), [0, 1], use_barrier=False)
        assert isinstance(b, NoBarrier)
        assert float(b.barr(jnp.array([99.0, 99.0]))) == 0


class TestPolicies:
    def test_roll_shift(self):
        p = RollPolicy(2, 4)
        u = jnp.arange(10.0).reshape(5, 2)
        out = np.asarray(p.shift(u, -2))
        np.testing.assert_allclose(out[:3], np.asarray(u)[2:])
        np.testing.assert_allclose(out[3:], 0.0)
        np.testing.assert_allclose(p.shift(u, 1), u)  # non-negative: unchanged

    def test_zero_shift(self):
        p = ZeroPolicy(2, 4)
        u = jnp.ones((5, 2))
        np.testing.assert_allclose(p.shift(u, -1), 0.0)
        np.testing.assert_allclose(p.shift(u, 0), u)

    def test_barrier_push(self):
        p = BarrierPushPolicy(2, 4)
        # at +x bound moving outward -> damped; y free -> nominal
        x = jnp.array([1.2, 0.0, 0.5, 0.5])
        u = p.act(x, jnp.array([9.0, 9.0]))
        np.testing.assert_allclose(u, [-5 * 0.5, 9.0], rtol=1e-6)
        dmu = np.asarray(p.dx(x, jnp.zeros(2)))
        assert dmu[0, 2] == -5.0 and dmu[1, 3] == 0.0

    @pytest.mark.slow
    def test_lqr_stabilizes(self):
        dyn = DoubleIntegrator(num_states=4, num_actions=2, dt=0.1)
        p = make_policy("LQR", dyn, horizon=10)
        assert isinstance(p, LQRPolicy)
        s = dyn.init(jnp.array([1.0, -1.0, 0.0, 0.0]))
        for _ in range(300):
            s = dyn.step(s, p.act(s.x, jnp.zeros(2)))
        assert float(jnp.linalg.norm(s.x)) < 0.5
