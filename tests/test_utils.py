import jax.numpy as jnp
import numpy as np
import pytest

from ealv_tpu.utils import (
    ws_conversion,
    find_non_vel_locs,
    expand_states_double_integrator,
)
from ealv_tpu.utils import rotations as rot


class TestWsConversion:
    def test_roundtrip(self, rng):
        tray = np.array([[0.325, 0.625], [-0.15, 0.15], [0.2, 0.5]])
        robot = np.array([[-1.0, 1.0], [-1.0, 1.0], [-1.0, 1.0]])
        pts = rng.uniform(-1, 1, size=(10, 3))
        fwd = ws_conversion(pts, robot, tray)
        back = ws_conversion(fwd, tray, robot)
        np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-6)

    def test_endpoints(self):
        tray = np.array([[2.0, 4.0]])
        robot = np.array([[-1.0, 1.0]])
        np.testing.assert_allclose(ws_conversion(np.array([-1.0]), robot, tray), [2.0])
        np.testing.assert_allclose(ws_conversion(np.array([1.0]), robot, tray), [4.0])
        np.testing.assert_allclose(ws_conversion(np.array([0.0]), robot, tray), [3.0])

    def test_truncates_extra_dims(self):
        # reference drops trailing velocity dims beyond the limit rows
        lim = np.array([[-1.0, 1.0], [-1.0, 1.0]])
        out = ws_conversion(np.array([0.5, 0.5, 99.0, 99.0]), lim, lim)
        assert out.shape == (2,)


class TestStateStrings:
    def test_find_non_vel_locs(self):
        nv, v, s = find_non_vel_locs("xyXY")
        assert nv == [0, 1] and v == [2, 3] and s == "xy"

    def test_expand(self):
        assert expand_states_double_integrator("xyw") == "xywXYW"


class TestRotations:
    def test_euler_matrix_roundtrip(self, rng):
        angles = rng.uniform(-1.2, 1.2, size=(50, 3)).astype(np.float32)
        R = rot.euler_angles_to_matrix(angles)
        back = rot.matrix_to_euler_angles(R)
        np.testing.assert_allclose(back, angles, rtol=1e-4, atol=1e-5)

    def test_matches_scipy_extrinsic_xyz(self, rng):
        # the reference flips pytorch3d's product order to match scipy's
        # extrinsic from_euler('xyz') (rotations.py:96, dynamics.py:312)
        scipy_rot = pytest.importorskip("scipy.spatial.transform").Rotation
        angles = rng.uniform(-1.2, 1.2, size=(20, 3))
        ours = np.asarray(rot.euler_angles_to_matrix(angles.astype(np.float32)))
        ref = scipy_rot.from_euler("xyz", angles).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_hat_unhat(self, rng):
        w = rng.standard_normal(3).astype(np.float32)
        W = rot.hat(w)
        np.testing.assert_allclose(np.asarray(W), -np.asarray(W).T, atol=1e-7)
        np.testing.assert_allclose(rot.unhat(W), w, atol=1e-7)

    def test_so3_exp_is_rotation(self, rng):
        w = rng.standard_normal((8, 3)).astype(np.float32)
        R = np.asarray(rot.so3_exp(w))
        eye = np.broadcast_to(np.eye(3), R.shape)
        np.testing.assert_allclose(R @ np.swapaxes(R, -1, -2), eye, atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)

    def test_so3_exp_matches_expm(self, rng):
        expm = pytest.importorskip("scipy.linalg").expm
        w = rng.standard_normal(3)
        ours = np.asarray(rot.so3_exp(w.astype(np.float32)))
        ref = expm(np.asarray(rot.hat(w)))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_wrap_angles(self):
        out = np.asarray(rot.wrap_angles(jnp.array([7.0, 4.0, -4.0])))
        assert 0 <= out[0] < 2 * np.pi
        assert -np.pi <= out[1] < np.pi and -np.pi <= out[2] < np.pi
        np.testing.assert_allclose(out[0], 7.0 - 2 * np.pi, rtol=1e-5)
