"""Software-in-the-loop tests of the native realtime controller library
(the reference validates these controllers only on hardware; here the 1 kHz
loop runs against a trivial integrator plant)."""

import numpy as np
import pytest

pytest.importorskip("ctypes")

from ealv_tpu.hw import NativeControllers, ControlMode


@pytest.fixture()
def mux():
    return NativeControllers(dt=1e-3, cmd_dt=0.1, max_force=30.0)


class TestVelFilter:
    def test_ramp_respects_slew_limit(self, mux):
        mux.command_twist([0.1, 0.0, 0.0, 0.0, 0.0, 0.0])
        prev = np.zeros(6)
        for _ in range(50):
            out = mux.tick_velocity()
            step = np.abs(out - prev)
            assert step[:3].max() <= 0.8e-3 + 1e-12  # max_lin per tick
            prev = out
        # after 50 ticks the ramp is at 50 * 0.8e-3 = 0.04
        np.testing.assert_allclose(prev[0], 0.04, rtol=1e-6)

    def test_converges_to_command(self, mux):
        mux.command_twist([0.05, -0.02, 0.0, 0.0, 0.0, 0.1])
        for _ in range(300):
            mux.command_twist([0.05, -0.02, 0.0, 0.0, 0.0, 0.1])
            out = mux.tick_velocity()
        np.testing.assert_allclose(out[:2], [0.05, -0.02], atol=1e-6)
        np.testing.assert_allclose(out[5], 0.1, atol=1e-6)

    def test_stale_command_decays(self, mux):
        mux.command_twist([0.05, 0, 0, 0, 0, 0])
        for _ in range(100):
            out = mux.tick_velocity()
        peak = out[0]
        # no further commands: after 2*cmd_dt the raw command decays
        for _ in range(5000):
            out = mux.tick_velocity()
        assert out[0] < peak * 0.2

    def test_force_safety_opposes_motion(self, mux):
        mux.command_twist([0.05, 0, 0, 0, 0, 0])
        for _ in range(200):
            mux.command_twist([0.05, 0, 0, 0, 0, 0])
            out = mux.tick_velocity()
        assert out[0] > 0.04
        # pressing +x produces an external wrench in -x; beyond
        # 0.75*max_force with opposite-sign command -> back off to zero
        mux.set_wrench([-25.0, 0, 0, 0, 0, 0])
        for _ in range(200):
            mux.command_twist([0.05, 0, 0, 0, 0, 0])
            out = mux.tick_velocity()
        assert abs(out[0]) < 1e-3  # driven back toward zero
        # same-sign wrench (moving AWAY from the contact) is not blocked
        mux.set_wrench([25.0, 0, 0, 0, 0, 0])
        for _ in range(200):
            mux.command_twist([0.05, 0, 0, 0, 0, 0])
            out = mux.tick_velocity()
        assert out[0] > 0.04

    def test_rt_failure_resets_ramp(self, mux):
        mux.command_twist([0.05, 0, 0, 0, 0, 0])
        for _ in range(100):
            out = mux.tick_velocity()
        ok = mux.command_twist([0.05, 0, 0, 0, 0, 0], rt_ok=False)
        assert not ok
        out = mux.tick_velocity()
        assert out[0] <= 0.8e-3 + 1e-12  # ramping from scratch


class TestPoseFilter:
    def test_double_lowpass_converges(self, mux):
        mux.switch_mode(ControlMode.POSE)
        current = np.eye(4)
        target = np.eye(4)
        target[0, 3] = 0.3  # row-major position; column-major layout: idx 12
        for _ in range(8000):
            mux.command_pose(target.T)  # column-major flatten
            cmd = mux.tick_pose(current.T.reshape(16))
            current = cmd.reshape(4, 4).T
        assert abs(current[0, 3] - 0.3) < 0.01

    def test_smooth_steps(self, mux):
        mux.switch_mode(ControlMode.POSE)
        current = np.eye(4)
        target = np.eye(4)
        target[0, 3] = 0.5
        last = 0.0
        for _ in range(500):
            mux.command_pose(target.T)
            cmd = mux.tick_pose(current.T.reshape(16)).reshape(4, 4).T
            step = abs(cmd[0, 3] - last)
            last = cmd[0, 3]
            current = cmd
        assert step < 1e-3  # double low-pass keeps per-tick motion tiny


class TestJointFilter:
    def test_pid_moves_toward_target_with_slew(self, mux):
        mux.switch_mode(ControlMode.JOINT)
        current = np.zeros(7)
        target = np.array([0.5, -0.5, 0.2, 0, 0, 0, 0.1])
        for _ in range(3000):
            mux.command_joints(target)
            nxt = mux.tick_joints(current)
            assert np.abs(nxt - current).max() <= 2.0e-3 + 1e-12
            current = nxt
        np.testing.assert_allclose(current, target, atol=0.02)


class TestMux:
    def test_mode_switch_resets_velocity(self, mux):
        mux.command_twist([0.05, 0, 0, 0, 0, 0])
        for _ in range(100):
            mux.tick_velocity()
        mux.switch_mode(ControlMode.POSE)
        mux.switch_mode(ControlMode.VELOCITY)
        assert mux.mode == ControlMode.VELOCITY
        out = mux.tick_velocity()
        # raw command was cleared; ramp decays back toward zero
        for _ in range(3000):
            out = mux.tick_velocity()
        assert abs(out[0]) < 0.01


class TestBridges:
    def test_synthetic_bridge_service_surface(self):
        import jax.numpy as jnp
        from ealv_tpu.utils.config import TRAY_LIM
        from ealv_tpu.sim import SyntheticEnv
        from ealv_tpu.hw import SyntheticBridge

        env = SyntheticEnv(tray_lim=tuple(TRAY_LIM[s] for s in "xyzrpw"),
                           dt=0.04, img_hw=(24, 24))
        s = env.init(jnp.asarray([0.45, 0.0, 0.3, 3.14, 0, 0]))
        br = SyntheticBridge(env, s)
        start = br.klerg_start_pose()
        assert br.klerg_cmd([0.05, 0, 0, 0, 0, 0])
        pose, vel, force, img = br.observe()
        assert pose[0] > start[0]
        assert img.shape == (24, 24, 3)
        # pause blocks commands (service failure -> pause semantics)
        br.pause.pause()
        assert not br.klerg_cmd([0.05, 0, 0, 0, 0, 0])

    def test_synthetic_bridge_packed_observe(self):
        # observe() is ONE device fetch split on host: shapes/dtypes of the
        # 4-tuple must match the unpacked env.observe, and the brightness
        # ride-along is cached host-side for the planner
        import jax.numpy as jnp
        from ealv_tpu.utils.config import TRAY_LIM
        from ealv_tpu.sim import SyntheticEnv
        from ealv_tpu.hw import SyntheticBridge

        env = SyntheticEnv(tray_lim=tuple(TRAY_LIM[s] for s in "xyzrpw"),
                           dt=0.04, img_hw=(24, 24))
        s = env.init(jnp.asarray([0.45, 0.0, 0.3, 3.14, 0, 0]))
        br = SyntheticBridge(env, s)
        pose, vel, force, img = br.observe()
        ep, ev, ef, ei = env.observe(s)
        assert pose.shape == (6,) and vel.shape == (6,)
        assert force.shape == np.asarray(ef).shape == (1,)
        assert img.shape == np.asarray(ei).shape == (24, 24, 3)
        np.testing.assert_allclose(pose, np.asarray(ep), atol=1e-6)
        np.testing.assert_allclose(img, np.asarray(ei), atol=1e-6)
        b0 = br.last_brightness
        br.klerg_cmd([0, 0, 0, 0, 0, 0], brightness=0.3)
        br.observe()
        assert br.last_brightness < b0  # moved toward the 0.3 command

    def test_native_bridge_loop(self):
        import time
        from ealv_tpu.hw import NativeBridge

        class FakeDriver:
            def __init__(self):
                self.pose = np.zeros(6)
                self.vel = np.zeros(6)

            def state(self):
                return self.pose.copy(), self.vel.copy(), np.zeros(6)

            def apply_velocity(self, twist):
                self.vel = np.asarray(twist)
                self.pose = self.pose + self.vel * 1e-3

            def apply_pose(self, m):
                pass

            def pose_matrix(self):
                return np.eye(4).reshape(16)

        drv = FakeDriver()
        br = NativeBridge(driver=drv)
        br.start()
        try:
            for _ in range(20):
                br.klerg_cmd([0.05, 0, 0, 0, 0, 0])
                time.sleep(0.01)
            pose, vel, force, img = br.observe()
        finally:
            br.stop()
        assert pose[0] > 0  # the 1 kHz loop ramped the robot forward
        assert img is None  # no camera attached
        # default clock -> the C++ RtLoop paced this run; check its stats
        s = br.loop_stats()
        assert s is not None and s["ticks"] > 0
        # live 1 kHz ring exposes the freshest (pose6, vel6) for planning
        latest = br.state_latest()
        assert latest is not None
        np.testing.assert_allclose(latest[0][:3], pose[:3], atol=1e-2)

    def test_pose_rejected_without_pose_interface(self):
        # ADVICE r3: the C loop's pose branch silently no-ops when the
        # driver has no apply_pose/pose_matrix (rt_loop.cpp:121-124 NULL
        # vtable guard) — klerg_pose must REJECT instead of reporting a
        # success the robot never executes.
        import time
        from ealv_tpu.hw import NativeBridge

        class VelOnlyDriver:
            def __init__(self):
                self.pose = np.zeros(6)

            def state(self):
                return self.pose.copy(), np.zeros(6), np.zeros(6)

            def apply_velocity(self, twist):
                self.pose = self.pose + np.asarray(twist) * 1e-3

            def pose_to_matrix(self, pose6):
                return np.eye(4).reshape(16)

        br = NativeBridge(driver=VelOnlyDriver())
        br.start()
        try:
            assert not br._native_loop.has_pose
            assert br.klerg_cmd([0.01, 0, 0, 0, 0, 0])  # velocity still fine
            assert not br.klerg_pose(np.zeros(6))  # pose loudly rejected
        finally:
            br.stop()

        # capability-based: also rejected before start() and on the legacy
        # Python-paced loop (where apply_pose would AttributeError inside
        # the daemon thread and silently kill the 1 kHz loop)
        br2 = NativeBridge(driver=VelOnlyDriver(), clock=lambda: 0.0)
        assert not br2.klerg_pose(np.zeros(6))


class TestRtLoop:
    """The C++ realtime loop: sustained rate and bounded jitter with zero
    Python in the tick path (the reference's controllers tick inside
    franka_control's 1 kHz RT callback; this is the library's own pacer,
    rt_loop.cpp)."""

    def test_native_sil_rate_and_jitter(self):
        import time
        from ealv_tpu.hw.native import NativeControllers, SilPlant, NativeLoop

        # Timing assertion on a timeshared 1-core box: a concurrent process
        # can steal the core for a whole measurement window, so allow up to
        # three windows before judging the loop itself.
        for attempt in range(3):
            mux = NativeControllers()
            plant = SilPlant(1e-3)
            loop = NativeLoop(mux, 1e-3, plant=plant)
            loop.start()
            mux.command_twist(np.array([0.1, 0, 0, 0, 0, 0]))
            time.sleep(2.0)
            loop.stop()
            s = loop.stats()
            ok = (s["rate_hz"] >= 900 and s["jitter_mean_s"] < 0.5e-3
                  and s["missed"] < 0.05 * s["ticks"])
            if ok or attempt == 2:
                # >=0.9 kHz sustained; mean wake latency under half a
                # period; missed deadlines rare (not an RT kernel)
                assert s["rate_hz"] >= 900, s
                assert s["jitter_mean_s"] < 0.5e-3, s
                assert s["missed"] < 0.05 * s["ticks"], s
                break
        # the plant integrated the ramped command
        pose, vel, _ = plant.state()
        assert pose[0] > 0

    def test_ring_closest_stamp(self):
        import time
        from ealv_tpu.hw.native import NativeControllers, SilPlant, NativeLoop

        mux = NativeControllers()
        plant = SilPlant(1e-3)
        loop = NativeLoop(mux, 1e-3, plant=plant)
        loop.start()
        mux.command_twist(np.array([0.2, 0, 0, 0, 0, 0]))
        time.sleep(0.3)
        t_q = time.monotonic() - 0.010  # 10 ms ago: inside the 64 ms ring
        time.sleep(0.02)
        loop.stop()
        hit = loop.state_closest(t_q)
        assert hit is not None
        stamp, pose, vel, wrench = hit
        assert abs(stamp - t_q) < 0.01  # aligned to within ~10 periods
        latest = loop.state_latest()
        assert latest is not None and latest[0] >= stamp


class TestStampAlignment:
    """observe() aligns the state sample to the camera frame's stamp and
    rejects stale frames (sensor_utils.py:322-358, :486-489)."""

    def _bridge(self, camera=None, t0=100.0):
        from ealv_tpu.hw import NativeBridge

        class FakeDriver:
            def state(self):
                return np.zeros(6), np.zeros(6), np.zeros(6)
            def apply_velocity(self, twist):
                pass
            def apply_pose(self, m):
                pass
            def pose_matrix(self):
                return np.eye(4).reshape(16)

        clock = {"t": t0}
        br = NativeBridge(driver=FakeDriver(), camera=camera,
                          clock=lambda: clock["t"])
        return br, clock

    def test_closest_stamp_selection(self):
        from ealv_tpu.hw.bridge import StampedCache
        br, clock = self._bridge(camera=lambda: (np.zeros((4, 4, 3)), 100.32))
        # stamped stream: pose x encodes its own stamp
        for t in (100.0, 100.1, 100.2, 100.3, 100.4, 100.5):
            br._state_cache.push(t, (np.full(6, t), np.zeros(6), np.zeros(6)))
        clock["t"] = 100.55
        pose, vel, force, img = br.observe()
        # frame stamped 100.32 -> the 100.3 sample, not the latest (100.5)
        np.testing.assert_allclose(pose, np.full(6, 100.3))

    def test_stale_frame_raises(self):
        from ealv_tpu.hw.bridge import StaleObservationError
        br, clock = self._bridge(camera=lambda: (np.zeros((4, 4, 3)), 100.0))
        clock["t"] = 101.5  # frame is 1.5 s old > 1.0 s threshold
        with pytest.raises(StaleObservationError):
            br.observe()

    def test_unstamped_camera_uses_now(self):
        br, clock = self._bridge(camera=lambda: np.zeros((4, 4, 3)))
        br._state_cache.push(100.0, (np.ones(6), np.zeros(6), np.zeros(6)))
        clock["t"] = 100.05
        pose, _, _, img = br.observe()
        np.testing.assert_allclose(pose, np.ones(6))
        assert img.shape == (4, 4, 3)

    def test_cache_empty_falls_back_to_driver(self):
        br, clock = self._bridge()
        pose, vel, force, img = br.observe()
        np.testing.assert_allclose(pose, np.zeros(6))


class TestDegradedRate:
    """Degraded control-rate handling through the PYTHON wiring (VERDICT r4
    #8). Reference semantics (cartesian_vel_interface.cpp:216-219): each
    velocity command answers success only while the RT deadline-hit ratio
    (control_command_success_rate) is > 0.5, and a degraded command resets
    the velocity ramp so motion restarts from scratch; the sensor side
    treats the failed service call as a fault (pause + heartbeat recover)."""

    def _bridge(self, t0=0.0):
        from ealv_tpu.hw import NativeBridge

        class FakeDriver:
            def __init__(self):
                self.pose = np.zeros(6)

            def state(self):
                return self.pose.copy(), np.zeros(6), np.zeros(6)

            def apply_velocity(self, twist):
                self.pose = self.pose + np.asarray(twist) * 1e-3

            def apply_pose(self, m):
                pass

            def pose_matrix(self):
                return np.eye(4).reshape(16)

        clock = {"t": t0}
        br = NativeBridge(driver=FakeDriver(), clock=lambda: clock["t"])
        return br, clock

    @staticmethod
    def _push_cadence(br, start, n, period):
        state = (np.zeros(6), np.zeros(6), np.zeros(6))
        for i in range(n):
            br._state_cache.push(start + i * period, state)
        return start + (n - 1) * period

    def test_success_rate_tracks_loop_cadence(self):
        br, _ = self._bridge()
        assert br.success_rate() == 1.0  # no evidence of degradation yet
        # healthy: state samples arrive at the expected 1/dt cadence
        t = self._push_cadence(br, 0.0, 64, br.dt)
        assert br.success_rate() > 0.95
        assert br.klerg_cmd([0.05, 0, 0, 0, 0, 0])
        # degraded: the loop only achieves a tenth of the expected rate
        self._push_cadence(br, t + br.dt, 64, 10 * br.dt)
        assert br.success_rate() < 0.5
        assert not br.klerg_cmd([0.05, 0, 0, 0, 0, 0])

    def test_degraded_command_resets_ramp(self):
        br, _ = self._bridge()
        t = self._push_cadence(br, 0.0, 64, br.dt)
        assert br.klerg_cmd([0.5, 0, 0, 0, 0, 0])
        for _ in range(40):
            v_healthy = br.mux.tick_velocity()
        assert v_healthy[0] > 0.01  # the ramp built up toward the command

        # loop degrades -> command REJECTED and the ramp resets from scratch
        self._push_cadence(br, t + br.dt, 64, 10 * br.dt)
        assert not br.klerg_cmd([0.5, 0, 0, 0, 0, 0])

        # loop recovers -> commands accepted again, motion ramps up from
        # zero ("robot stopped moving so need to ramp up again from
        # scratch"), NOT from the previously built-up velocity
        self._push_cadence(br, t + 1000.0, 64, br.dt)
        assert br.success_rate() > 0.95
        assert br.klerg_cmd([0.5, 0, 0, 0, 0, 0])
        v_restart = br.mux.tick_velocity()
        assert v_restart[0] < 0.5 * v_healthy[0]

    @pytest.mark.slow
    def test_degraded_rate_pauses_host_loop_then_recovers(self):
        from ealv_tpu.runtime import HostLoopRunner
        from ealv_tpu.runtime.watchdog import RecoveryHeartbeat
        from test_host_loop import tiny_experiment

        exp = tiny_experiment()
        br, clock = self._bridge()
        br.camera = lambda: (np.zeros((24, 24, 3), np.float32), clock["t"])
        runner = HostLoopRunner(
            exp, br,
            heartbeat=RecoveryHeartbeat(period_s=100.0, timeout_s=0.0))
        es = exp.init(seed=0)

        t = self._push_cadence(br, 0.0, 64, br.dt)
        es = runner.step(es)
        es = runner.step(es)
        assert not runner.pause.paused

        # the 1 kHz loop degrades below the 0.5 success threshold -> the
        # next commanded step fails the service call -> pause
        self._push_cadence(br, t + br.dt, 64, 10 * br.dt)
        es = runner.step(es)
        assert runner.pause.paused
        assert "cmd_failed" in runner.events

        # cadence recovers -> heartbeat resumes (arm, then fire) and motion
        # commands flow again
        self._push_cadence(br, t + 1000.0, 64, br.dt)
        es = runner.step(es)
        es = runner.step(es)
        assert not runner.pause.paused
        assert "recover" in runner.events
        es = runner.step(es)
        assert not runner.pause.paused
