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


@pytest.mark.slow
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

    def test_one_observation_per_step_and_cache_invalidation(self, exp):
        # the tunnel-latency contract: steady-state steps pay ONE bridge
        # observation (the post-command frame doubles as the next step's
        # sync frame); recovery/goal-seek moves invalidate the cache
        bridge, es = make_bridge(exp, seed=8)
        calls = {"n": 0}
        orig = bridge.observe

        def counting_observe():
            calls["n"] += 1
            return orig()

        bridge.observe = counting_observe
        runner = HostLoopRunner(exp, bridge)
        es = runner.step(es)          # cold: sync obs + post-cmd obs
        assert calls["n"] == 2
        es = runner.step(es)          # warm: post-cmd obs only
        es = runner.step(es)
        assert calls["n"] == 4
        runner._recover()             # pose may jump: cache dropped
        assert runner._obs is None
        es = runner.step(es)
        assert calls["n"] == 6        # re-sync + post-cmd


@pytest.mark.slow
class TestPipelinedHostLoop:
    """The pipelined step (plan t+1 fused into absorb t's dispatch) must be
    a pure latency optimization: identical commands, identical trajectory,
    same robustness behavior as the serial path."""

    @pytest.fixture(scope="class")
    def exp(self):
        return tiny_experiment()

    @pytest.mark.parametrize("device_fast", [False, True])
    def test_pipeline_matches_serial_trajectory(self, exp, device_fast):
        es0 = exp.init(seed=9)
        b_p = SyntheticBridge(exp.env, es0.env)
        b_s = SyntheticBridge(exp.env, es0.env)
        r_p = HostLoopRunner(exp, b_p, pipeline=True,
                             device_fast=device_fast)
        r_s = HostLoopRunner(exp, b_s, pipeline=False)
        assert r_p._fast == device_fast  # fast path engages iff requested
        e_p, e_s = es0, es0
        for _ in range(6):
            e_p = r_p.step(e_p)
            e_s = r_s.step(e_s)
        assert int(e_p.explr_step) == int(e_s.explr_step) == 6
        np.testing.assert_allclose(np.asarray(b_p.state.pose),
                                   np.asarray(b_s.state.pose), atol=1e-5)
        np.testing.assert_allclose(np.asarray(e_p.buf.x[:6]),
                                   np.asarray(e_s.buf.x[:6]), atol=1e-5)

    def test_fused_single_dispatch_gating(self, exp):
        # SyntheticBridge exposes cmd_observe_pure, so the fast path fuses
        # the whole step (cmd+observe+absorb+plan) into ONE program...
        bridge, es = make_bridge(exp, seed=21)
        runner = HostLoopRunner(exp, bridge, pipeline=True)
        assert runner._fast and runner._cmd_absorb_plan is not None
        es = runner.run(es, 4)
        assert int(es.explr_step) == 4

        # ...but a subclass that customizes cmd_observe_device must keep
        # its override in the loop: the fused program would bypass it
        class CustomDeviceBridge(SyntheticBridge):
            def cmd_observe_device(self, cmd7):
                return super().cmd_observe_device(cmd7)

        es2 = exp.init(seed=21)
        bridge2 = CustomDeviceBridge(exp.env, es2.env)
        r2 = HostLoopRunner(exp, bridge2, pipeline=True)
        assert r2._fast and r2._cmd_absorb_plan is None
        es2 = r2.run(es2, 4)
        assert int(es2.explr_step) == 4
        # both forms walk the same trajectory (pure latency optimization)
        np.testing.assert_allclose(np.asarray(bridge.state.pose),
                                   np.asarray(bridge2.state.pose),
                                   atol=1e-5)

        # instance-level monkeypatching (tests, shims) must also disable
        # the fused form, which would otherwise bypass the patch
        bridge3, _es3 = make_bridge(exp, seed=21)
        bridge3.cmd_observe_device = lambda cmd7: (_ for _ in ()).throw(
            AssertionError("patched method must stay in the loop"))
        r3 = HostLoopRunner(exp, bridge3, pipeline=True)
        assert r3._fast and r3._cmd_absorb_plan is None

    def test_fast_path_falls_back_on_overridden_bridge(self, exp):
        # WedgedBridge overrides klerg_cmd, so the fused device program
        # would bypass its wedge behavior — device_fast_path_ok must
        # refuse and the runner fall back to the host-side pipeline
        env0 = exp.init(seed=13).env
        bridge = WedgedBridge(exp.env, env0)
        assert not bridge.device_fast_path_ok()
        runner = HostLoopRunner(exp, bridge, pipeline=True)
        assert not runner._fast
        es = runner.run(exp.init(seed=13), 8)
        assert int(es.explr_step) == 8  # wedge handling still works

    def test_fast_path_stuck_invalidates_pipeline(self, exp):
        # with an absurd stuck tolerance every fast step trips the
        # detector: the step must still absorb, log, drop the in-flight
        # plan, and re-prime — no livelock, no lost steps
        from ealv_tpu.runtime.watchdog import StuckDetector

        bridge, es = make_bridge(exp, seed=14)
        runner = HostLoopRunner(exp, bridge, pipeline=True,
                                stuck=StuckDetector(tol=1e9))
        assert runner._fast
        es = runner.run(es, 5)
        assert int(es.explr_step) == 5
        assert "stuck_reset" in runner.events or "stuck_escape" in runner.events
        assert runner._pending is None  # last hit re-primes next step

    def test_pipeline_invalidated_on_cmd_failure(self, exp):
        env0 = exp.init(seed=10).env
        bridge = FailingBridge(exp.env, env0, fail_after=2)
        runner = HostLoopRunner(
            exp, bridge, pipeline=True,
            heartbeat=RecoveryHeartbeat(period_s=100.0, timeout_s=0.0))
        es = exp.init(seed=10)
        es = runner.step(es)
        es = runner.step(es)
        assert runner._pending is not None  # steady-state pipeline primed
        es = runner.step(es)  # command fails -> pause, plan discarded
        assert runner.pause.paused
        assert runner._pending is None
        es = runner.step(es)  # heartbeat arms
        es = runner.step(es)  # heartbeat recovers; runner re-primes
        assert not runner.pause.paused
        es = runner.step(es)
        assert int(es.explr_step) >= 3

    def test_pipeline_survives_stuck_escape(self, exp):
        env0 = exp.init(seed=11).env
        bridge = WedgedBridge(exp.env, env0, wedge_after=3)
        runner = HostLoopRunner(exp, bridge, pipeline=True)
        es = runner.run(exp.init(seed=11), 12)
        assert "stuck_escape" in runner.events
        assert bridge.unwedged_by_escape
        assert int(es.explr_step) == 12

    def test_recover_clears_pending(self, exp):
        bridge, es = make_bridge(exp, seed=12)
        runner = HostLoopRunner(exp, bridge, pipeline=True)
        es = runner.step(es)
        assert runner._pending is not None
        runner._recover()
        assert runner._pending is None and runner._obs is None

    def test_brightness_observed_back_from_node(self, exp):
        # ADVICE r3 (medium): on the NativeBridge path the commanded
        # brightness must be observed back through the BrightnessNode —
        # the reference syncs /usb_cam/brightness into the state vector
        # (sensor_utils.py:479-547); a constant 1.0 would blind the model
        # to the physical lamp state.
        class _Node:
            current = 0.37

        class _Bridge:
            brightness_node = _Node()
            pause = None

        runner = HostLoopRunner(exp, _Bridge())
        assert runner._brightness(np.zeros(6)) == pytest.approx(0.37)

    def test_config_fields_are_keyword_only(self, exp):
        # Regression: HostLoopRunner(exp, bridge, ml) used to silently bind
        # a MetricsLog positional to the later-added `pipeline` field,
        # discarding the run's event log. Everything past `bridge` is
        # KW_ONLY so that call now fails loudly.
        bridge, _es = make_bridge(exp)
        with pytest.raises(TypeError):
            HostLoopRunner(exp, bridge, MetricsLog(None, echo=False))
        runner = HostLoopRunner(exp, bridge,
                                metrics=MetricsLog(None, echo=False))
        assert isinstance(runner.metrics, MetricsLog)
        assert runner.pipeline is True  # defaults undisturbed


class _Attr:
    """Auto-vivifying attribute bag for geometry messages."""
    def __init__(self):
        self.__dict__["_d"] = {}
    def __getattr__(self, k):
        d = self.__dict__["_d"]
        if k not in d:
            d[k] = _Attr()
        return d[k]
    def __setattr__(self, k, v):
        self.__dict__["_d"][k] = v


class _FakeGeom:
    Pose = _Attr
    PoseStamped = _Attr
    TwistStamped = _Attr
    WrenchStamped = _Attr


class _FakeSrv:
    class Empty:
        pass
    GetStartState = UpdateVel = UpdateState = object

    class GetStartStateResponse:
        def __init__(self, pose, ok):
            self.start_pose, self.success = pose, ok

    class UpdateVelResponse:
        def __init__(self, pose, ok):
            self.actual_pose, self.success = pose, ok

    class UpdateStateResponse:
        def __init__(self, pose, ok):
            self.actual_pose, self.success = pose, ok


class _FakeRos:
    """Records services/subscribers/publishers like rospy would register."""
    def __init__(self):
        self.services = {}
        self.subs = {}
        self.published = []
    def init_node(self, name):
        self.node = name
    def Service(self, name, typ, cb):
        self.services[name] = cb
        return (name, cb)
    def Subscriber(self, name, typ, cb):
        self.subs[name] = cb
        return (name, cb)
    def Publisher(self, topic, typ, queue_size=1):
        ros = self
        class _Pub:
            def publish(self, msg, _t=topic):
                ros.published.append((_t, msg))
        return _Pub()


@pytest.mark.slow
class TestRosBridgeServer:
    """Full ROS service surface (franka_module.py:108-131) SIL-tested with an
    injected rospy stand-in — only serve_ros's import shim needs real ROS."""

    @pytest.fixture(scope="class")
    def server(self):
        from ealv_tpu.hw.bridge import RosBridgeServer
        exp = tiny_experiment()
        bridge, _ = make_bridge(exp)
        ros = _FakeRos()
        srv = RosBridgeServer(bridge, ros, _FakeSrv, _FakeGeom)
        return srv, ros, bridge

    def test_services_and_topics_registered(self, server):
        srv, ros, bridge = server
        assert set(ros.services) == {"/klerg_start_pose", "/klerg_cmd",
                                     "/klerg_pose"}
        assert {"/reset", "/reset_joints", "/pause", "/resume"} <= set(ros.subs)

    def test_vel_service_moves_robot(self, server):
        srv, ros, bridge = server
        p0 = bridge.klerg_start_pose().copy()
        req = _Attr()
        req.desired_vel.linear.x = 0.05
        req.desired_vel.linear.y = 0.0
        req.desired_vel.linear.z = 0.0
        req.desired_vel.angular.x = 0.0
        req.desired_vel.angular.y = 0.0
        req.desired_vel.angular.z = 0.0
        req.desired_brightness = -1.0
        for _ in range(5):
            resp = ros.services["/klerg_cmd"](req)
        assert resp.success
        assert bridge.klerg_start_pose()[0] > p0[0]
        assert abs(resp.actual_pose.position.x
                   - bridge.klerg_start_pose()[0]) < 1e-5

    def test_pose_service_round_trips_orientation(self, server):
        srv, ros, bridge = server
        # target pose with roll ~ pi (tray convention) through the
        # quaternion round-trip
        target = np.array([0.5, 0.05, 0.3, np.pi - 0.2, 0.1, 0.4], np.float32)
        req = _Attr()
        req.desired_pose = srv._pose_msg(target)
        req.desired_brightness = -1.0
        back = srv._msg_pose6(req.desired_pose)
        np.testing.assert_allclose(back, target, atol=1e-4)
        for _ in range(40):
            resp = ros.services["/klerg_pose"](req)
        assert resp.success
        np.testing.assert_allclose(bridge.klerg_start_pose()[:3],
                                   target[:3], atol=5e-3)

    def test_pause_topic_gates_commands(self, server):
        srv, ros, bridge = server
        ros.subs["/pause"](None)
        req = _Attr()
        for ax in ("x", "y", "z"):
            setattr(req.desired_vel.linear, ax, 0.1)
            setattr(req.desired_vel.angular, ax, 0.0)
        req.desired_brightness = -1.0
        resp = ros.services["/klerg_cmd"](req)
        assert not resp.success
        ros.subs["/resume"](None)
        assert ros.services["/klerg_cmd"](req).success

    def test_publish_once_emits_state(self, server):
        srv, ros, bridge = server
        n0 = len(ros.published)
        srv.publish_once()
        topics = [t for t, _ in ros.published[n0:]]
        assert topics == ["/ee_pose", "/ee_vel", "/ee_wrench"]

    def test_serve_ros_shim_gates_cleanly(self, server):
        from ealv_tpu.hw.bridge import serve_ros
        _, _, bridge = server
        with pytest.raises(ImportError, match="ROS"):
            serve_ros(bridge)
