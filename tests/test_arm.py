"""Joint-space arm simulator (ealv_tpu/sim/arm.py).

Fidelity targets: EE-velocity via Jacobian-pinv joint velocities with
substeps (franka_env.py:207-237), DLS IK pose control (:238-244), periodic
drift correction (franka_module.py:295-318), joint reset, and the
kinematic failure modes (limit saturation, drift) the robustness layer
exists for.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealv_tpu.sim.arm import (
    ArmEnv, Q_HOME, Q_MIN, Q_MAX, fk, geometric_jacobian, solve_ik,
)
from ealv_tpu.utils.config import TRAY_LIM

TRAY6 = tuple(TRAY_LIM[s] for s in "xyzrpw")
DOWN = jnp.array([0.45, 0.0, 0.3, np.pi, 0.0, 0.0])


def make_env(**kw):
    kw.setdefault("img_hw", (32, 32))
    return ArmEnv(tray_lim=TRAY6, dt=0.04, **kw)


class TestKinematics:
    def test_fk_home(self):
        p, R = fk(Q_HOME)
        # Panda home: EE in front of the base, pointing down
        assert 0.3 < float(p[0]) < 0.6
        assert abs(float(p[1])) < 1e-5
        assert 0.4 < float(p[2]) < 0.8
        assert float(R[2, 2]) < -0.9  # z axis pointing down

    def test_jacobian_matches_autodiff(self):
        q = Q_HOME + 0.1
        J = np.asarray(geometric_jacobian(q))
        Jad = np.asarray(jax.jacfwd(lambda q: fk(q)[0])(q))
        np.testing.assert_allclose(J[:3], Jad, atol=1e-5)

    def test_ik_converges(self):
        q = solve_ik(Q_HOME, DOWN, iters=100)
        p, R = fk(q)
        np.testing.assert_allclose(np.asarray(p), np.asarray(DOWN[:3]), atol=1e-4)
        assert float(R[2, 2]) < -0.999  # level, pointing down
        assert (np.asarray(q) >= np.asarray(Q_MIN) - 1e-6).all()
        assert (np.asarray(q) <= np.asarray(Q_MAX) + 1e-6).all()


@pytest.mark.slow
class TestArmEnv:
    def test_init_reaches_pose_in_tray_convention(self):
        env = make_env()
        s = env.init(DOWN)
        pose = np.asarray(s.pose)
        np.testing.assert_allclose(pose[:3], np.asarray(DOWN[:3]), atol=1e-3)
        # roll reported in the tray box convention (~ +pi, not -pi)
        assert 2.39 < pose[3] < 3.89

    def test_vel_tracking(self):
        env = make_env(drift_every=0)
        s = env.init(DOWN)
        step = jax.jit(env.step_vel)
        for _ in range(25):
            s = step(s, jnp.array([0.1, 0.0, 0.0, 0.0, 0.0, 0.0]))
        pose = np.asarray(s.pose)
        # 25 steps * 0.04 s * 0.1 m/s = 0.1 m, tracked through joint space
        np.testing.assert_allclose(pose[0], 0.55, atol=5e-3)
        np.testing.assert_allclose(pose[1:3], [0.0, 0.3], atol=5e-3)

    def test_yaw_tracking(self):
        env = make_env(drift_every=0)
        s = env.init(DOWN)
        step = jax.jit(env.step_vel)
        for _ in range(25):
            s = step(s, jnp.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.5]))
        assert abs(float(s.pose[5]) - 0.5) < 0.05

    def test_pose_control_converges(self):
        env = make_env()
        s = env.init(DOWN)
        target = jnp.array([0.5, 0.1, 0.35, np.pi, 0.0, 0.5])
        step = jax.jit(env.step_pose)
        for _ in range(40):
            s = step(s, target)
        np.testing.assert_allclose(np.asarray(s.pose)[:3],
                                   np.asarray(target)[:3], atol=2e-3)
        assert abs(float(s.pose[5]) - 0.5) < 2e-2

    def test_reset_joints(self):
        env = make_env()
        s = env.init(DOWN)
        s = env.step_vel(s, jnp.array([0.1, 0.1, 0.0, 0.0, 0.0, 0.0]))
        s = env.reset_joints(s)
        np.testing.assert_allclose(np.asarray(s.q), np.asarray(Q_HOME))
        p, _ = fk(Q_HOME)
        np.testing.assert_allclose(np.asarray(s.pose)[:3], np.asarray(p),
                                   atol=1e-5)

    def test_drift_correction_relevels(self):
        # command a twist with a roll component; drift correction re-levels
        # roll/pitch every `drift_every` commands (franka_module.py:305-318)
        env = make_env(drift_every=5, level_ee=True)
        s = env.init(DOWN)
        step = jax.jit(env.step_vel)
        cmd = jnp.array([0.02, 0.0, 0.0, 0.3, 0.0, 0.0])
        rolls = []
        for _ in range(20):
            s = step(s, cmd)
            rolls.append(abs(float(s.pose[3]) - np.pi))
        env0 = make_env(drift_every=0)
        s0 = env0.init(DOWN)
        for _ in range(20):
            s0 = env0.step_vel(s0, cmd)
        # without correction roll accumulates; with it, it is pulled back
        assert rolls[-1] < abs(float(s0.pose[3]) - np.pi)

    def test_limit_saturation_stops_tracking(self):
        # the failure mode the free-flying env cannot exhibit: commanding
        # through the workspace edge saturates joints and tracking stalls --
        # exactly what StuckDetector watches for (sensor_utils.py:444-457)
        env = make_env(drift_every=0)
        s = env.init(DOWN)
        step = jax.jit(env.step_vel)
        for _ in range(90):
            s = step(s, jnp.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0]))
        x0 = float(s.pose[0])
        for _ in range(10):
            s = step(s, jnp.array([0.5, 0.0, 0.0, 0.0, 0.0, 0.0]))
        # commanded 0.5 m/s * 10 * dt = 0.2 m; delivered ~ nothing
        assert abs(float(s.pose[0]) - x0) < 0.02
        assert float(s.pose[0]) < 1.2  # kinematic reach, not command integral

    def test_observe_contact_and_image(self):
        from ealv_tpu.sim import TrayScene
        env = make_env()
        scene = TrayScene.default()
        over = jnp.concatenate([scene.obj_xy[0],
                                jnp.array([0.21, np.pi, 0.0, 0.0])])
        s = env.init(over, scene=scene)
        pose, vel, force, img = env.observe(s)
        assert img.shape == (32, 32, 3)
        assert force.shape == (1,)
        assert float(force[0]) > 0.0
        s_hi = env.init(over.at[2].set(0.5), scene=scene)
        _, _, f_hi, _ = env.observe(s_hi)
        assert float(f_hi[0]) == 0.0


@pytest.mark.slow
class TestArmExperiment:
    def test_tick_runs_on_arm_backend(self):
        from ealv_tpu.utils.config import ExperimentConfig
        from ealv_tpu.runtime import Experiment
        cfg = ExperimentConfig(
            states="xyw",
            image_dim=(24, 24, 3),
            cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(8, 8),
            hidden_dim=(64, 32), z_dim=8,
            num_target_samples=128, num_traj_samples=64,
            traj_buffer_capacity=256, buffer_capacity=256,
            batch_size=8, num_learning_opt=2,
            sim_backend="arm",
        )
        exp = Experiment(cfg, train_calls_per_tick=1)
        es = exp.init(seed=0)
        tick = jax.jit(exp.tick)
        for _ in range(5):
            es, info = tick(es)
        assert int(es.explr_step) == 5
        assert np.isfinite(float(info["loss"]))
        # the arm actually moved and stayed in reach
        pose = np.asarray(es.env.pose)
        assert np.isfinite(pose).all()
        assert abs(pose[0]) < 1.2


@pytest.mark.slow
class TestArmRobustnessIntegration:
    """The arm exhibits the exact failure modes the robustness layer exists
    for and the free-flying env cannot produce: out-of-reach goals fail to
    converge (check_goal_pos retries + joint-reset escalation,
    sensor_utils.py:375-441), and reachable goals succeed after a reset."""

    def test_goal_seek_fails_out_of_reach_then_recovers(self):
        from ealv_tpu.runtime.watchdog import GoalSeeker
        env = make_env()
        state = {"s": env.init(DOWN)}
        step_pose = jax.jit(env.step_pose)

        def step_fn(goal):
            # one attempt = a burst of pose servo steps toward the goal
            target = jnp.asarray(
                [goal[0], goal[1], goal[2], np.pi, 0.0, goal[3]], jnp.float32)
            for _ in range(20):
                state["s"] = step_pose(state["s"], target)
            p = np.asarray(state["s"].pose)
            return np.array([p[0], p[1], p[2], p[5]])

        resets = []
        def reset_fn():
            resets.append(True)
            state["s"] = env.reset_joints(state["s"])

        gs = GoalSeeker(pos_tol=0.02, max_tries=4)
        # out of kinematic reach: seek fails and the joint-reset escalation
        # fired mid-way (the reference's resetJointsCallback path)
        ok, pos = gs.seek(np.array([1.1, 0.0, 0.3, 0.0]), step_fn,
                          reset_fn=reset_fn)
        assert not ok
        assert resets  # escalation actually ran
        assert pos[0] < 1.0  # the arm physically cannot get there

        # reachable goal after the reset: converges
        ok, pos = gs.seek(np.array([0.5, 0.05, 0.32, 0.0]), step_fn,
                          reset_fn=reset_fn)
        assert ok
        np.testing.assert_allclose(pos[:3], [0.5, 0.05, 0.32], atol=0.02)
