"""Host-in-the-loop runtime: robustness wiring (stuck escape, pause/recover,
goal seeking, panel hooks) driving the same jitted plan/absorb programs.

Reference semantics under test: sensor_utils.check_cmd (:444-457) +
vel_move_force_norm (:460-476) stuck escape, check_goal_pos (:375-441)
goal-seek retries, service-exception -> pause (sensor_main_module.py:153-166),
random_listener auto-recovery heartbeat (:44-117).
"""

import numpy as np
import pytest

from ealv_tpu.hw.bridge import SyntheticBridge
from ealv_tpu.runtime import Experiment, HostLoopRunner
from ealv_tpu.runtime.host_loop import MetricsLog
from ealv_tpu.runtime.panel import ControlPanel
from ealv_tpu.runtime.watchdog import RecoveryHeartbeat
from ealv_tpu.utils.config import ExperimentConfig


def tiny_experiment(**kw):
    cfg = ExperimentConfig(
        states="xyw", image_dim=(24, 24, 3),
        cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(8, 8),
        hidden_dim=(64, 32), z_dim=8,
        num_target_samples=128, num_traj_samples=64,
        traj_buffer_capacity=256, buffer_capacity=256,
        batch_size=8, num_learning_opt=2, **kw,
    )
    return Experiment(cfg, train_calls_per_tick=1)


def make_bridge(exp, seed=0):
    es = exp.init(seed=seed)
    return SyntheticBridge(exp.env, es.env), es


class WedgedBridge(SyntheticBridge):
    """A bridge whose robot wedges against an obstacle: motion commands are
    swallowed (pose frozen, directional contact force reported) until an
    escape command roughly along the force direction arrives."""

    def __init__(self, env, env_state, wedge_after=3, force_dir=(0.0, 0.0, 1.0)):
        super().__init__(env, env_state)
        self.wedge_after = wedge_after
        self.force_dir = np.asarray(force_dir, np.float64)
        self.cmds = 0
        self.wedged = False
        self.unwedged_by_escape = False

    def klerg_cmd(self, twist6, brightness=-1.0):
        self.cmds += 1
        if self.cmds == self.wedge_after:
            self.wedged = True
        if self.wedged:
            t = np.asarray(twist6, np.float64)
            along = float(t[:3] @ self.force_dir)
            if along > 1e-6 and along > 0.9 * np.linalg.norm(t[:3]) * np.linalg.norm(self.force_dir) / max(np.linalg.norm(self.force_dir), 1e-9):
                # escape along the contact normal frees the robot
                self.wedged = False
                self.unwedged_by_escape = True
                return super().klerg_cmd(twist6, brightness)
            return True  # command accepted but robot does not move
        return super().klerg_cmd(twist6, brightness)

    def observe(self):
        pose, vel, force, img = super().observe()
        if self.wedged:
            force = 10.0 * self.force_dir  # directional wrench reading
        return pose, vel, force, img


class FailingBridge(SyntheticBridge):
    """Rejects ``fail_count`` velocity commands after the first ``fail_after``
    (a transient fault window)."""

    def __init__(self, env, env_state, fail_after=2, fail_count=1):
        super().__init__(env, env_state)
        self.n = 0
        self.fail_after = fail_after
        self.fail_count = fail_count

    def klerg_cmd(self, twist6, brightness=-1.0):
        self.n += 1
        if self.fail_after < self.n <= self.fail_after + self.fail_count:
            return False
        return super().klerg_cmd(twist6, brightness)


class TestHostLoop:
    @pytest.fixture(scope="class")
    def exp(self):
        return tiny_experiment()

    def test_plain_run_matches_fused_semantics(self, exp):
        bridge, es = make_bridge(exp)
        runner = HostLoopRunner(exp, bridge)
        es = runner.run(es, 6)
        assert int(es.explr_step) == 6
        assert int(es.buf.size) == 6
        assert bool(es.mstate.initialized)

    def test_stuck_escape_recovers_and_logs(self, exp):
        env0 = exp.init(seed=1).env
        bridge = WedgedBridge(exp.env, env0, wedge_after=3)
        runner = HostLoopRunner(exp, bridge)
        es = exp.init(seed=1)
        es = runner.run(es, 12)
        # the loop detected the wedge, commanded a force-direction escape,
        # and the escape actually freed the robot
        assert "stuck_escape" in runner.events
        assert bridge.unwedged_by_escape
        assert not bridge.wedged
        assert int(es.explr_step) == 12  # experiment completed despite wedge

    def test_cmd_failure_pauses_then_heartbeat_recovers(self, exp):
        env0 = exp.init(seed=2).env
        bridge = FailingBridge(exp.env, env0, fail_after=2)
        runner = HostLoopRunner(
            exp, bridge, heartbeat=RecoveryHeartbeat(period_s=100.0, timeout_s=0.0)
        )
        es = exp.init(seed=2)
        es = runner.step(es)
        es = runner.step(es)
        assert not runner.pause.paused
        es = runner.step(es)  # this command fails -> pause
        assert runner.pause.paused
        assert "cmd_failed" in runner.events
        # heartbeat auto-recovery: first paused tick arms the timer, the
        # second fires recover_fn + resume (random_listener's periodic
        # resume semantics)
        es = runner.step(es)
        es = runner.step(es)
        assert not runner.pause.paused
        assert "recover" in runner.events

    def test_goal_seek_reaches_start(self, exp):
        bridge, es = make_bridge(exp, seed=3)
        runner = HostLoopRunner(exp, bridge)
        # within tray limits (roll is gimballed around pi: lims (2.39, 3.89))
        goal = np.array([0.5, 0.05, 0.35, 3.2, 0.0, 0.0])
        ok, pos = runner.drive_to_start(goal)
        assert ok
        assert np.linalg.norm(pos - goal) < runner.seeker.pos_tol

    def test_goal_seek_failure_logged(self, exp):
        bridge, es = make_bridge(exp, seed=4)

        def frozen_cmd(pose6, brightness=-1.0):
            return True  # accepts but never moves

        bridge.klerg_pose = frozen_cmd
        runner = HostLoopRunner(exp, bridge)
        runner.seeker.max_tries = 3
        ok, _ = runner.drive_to_start(np.array([0.6, 0.08, 0.35, 0, 0, 0]))
        assert not ok
        assert "goal_seek_failed" in runner.events

    def test_pause_blocks_motion(self, exp):
        bridge, es = make_bridge(exp, seed=5)
        runner = HostLoopRunner(
            exp, bridge, heartbeat=RecoveryHeartbeat(period_s=100.0, timeout_s=100.0)
        )
        runner.pause.pause()
        pose_before = bridge.observe()[0].copy()
        es2 = runner.step(es)
        assert np.allclose(bridge.observe()[0], pose_before)
        assert int(es2.explr_step) == int(es.explr_step)  # no sample pushed

    def test_save_request_triggers_save_fn(self, exp):
        bridge, es = make_bridge(exp, seed=6)
        saved = []
        runner = HostLoopRunner(exp, bridge, save_fn=lambda s: saved.append(int(s.explr_step)))
        runner.pause.request_save()
        es = runner.step(es)
        assert saved == [1]

    def test_panel_drives_runner_hooks(self, exp):
        bridge, es = make_bridge(exp, seed=7)
        runner = HostLoopRunner(exp, bridge)
        import io
        out = io.StringIO()
        panel = ControlPanel(runner.hooks(), out=out)
        panel.handle("pause")
        assert runner.pause.paused
        panel.handle("resume")
        assert not runner.pause.paused
        panel.handle("mode pose")  # SyntheticBridge: no-op switch, no crash
        panel.handle("save")
        assert runner.pause.save_requested
