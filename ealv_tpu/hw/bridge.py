"""Hardware/sim service bridge — the reference's ROS surface without ROS.

Parity target: the L1 robot facade (SURVEY.md §1): the `/klerg_cmd`
(UpdateVel), `/klerg_pose` (UpdateState), `/klerg_start_pose`
(GetStartState) services and the pause/resume/reset/controller-switch
topics served by scripts/go_vel (hardware) and FrankaBridge (sim,
franka_module.py:111-131).

``RobotBridge`` is the abstract surface the experiment loops talk to;
``SyntheticBridge`` backs it with the jittable sim; ``NativeBridge`` backs
it with the C++ controller mux at 1 kHz for a real robot driver (the
driver callback supplies robot state and consumes filter outputs — e.g., a
libfranka control loop or any RT transport). When rospy is importable, a
thin server can re-export RobotBridge methods as actual ROS services; this
image has no ROS, so that wrapper is deliberately import-gated.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Optional

import numpy as np

from ..runtime.watchdog import PauseManager


class RobotBridge:
    """Service surface: velocity/pose commands + synced observation."""

    def klerg_cmd(self, twist6, brightness: float = -1.0) -> bool:
        """Velocity command (UpdateVel). Returns success."""
        raise NotImplementedError

    def klerg_pose(self, pose6, brightness: float = -1.0) -> bool:
        """Pose command (UpdateState)."""
        raise NotImplementedError

    def klerg_start_pose(self):
        """(GetStartState): current pose6."""
        raise NotImplementedError

    def observe(self):
        """Synced (pose6, vel6, force, image) tuple."""
        raise NotImplementedError

    # topic surface
    def reset(self):
        pass

    def switch_controller(self, mode: str):
        pass


class SyntheticBridge(RobotBridge):
    """Back the service surface with the jittable synthetic env (the role of
    FrankaBridge + pybullet_service)."""

    def __init__(self, env, env_state, pause: Optional[PauseManager] = None):
        self.env = env
        self.state = env_state
        self.pause = pause or PauseManager()
        # eager per-step env math costs one dispatch round-trip per op over
        # the TPU tunnel; jit collapses each service call to one program
        import jax
        import jax.numpy as jnp
        self._step_vel = jax.jit(lambda s, v: env.step_vel(s, v))
        self._step_vel_b = jax.jit(lambda s, v, b: env.step_vel(s, v, b))
        self._step_pose = jax.jit(lambda s, p: env.step_pose(s, p))
        self._step_pose_b = jax.jit(lambda s, p, b: env.step_pose(s, p, b))

        # Over a tunneled TPU every device->host fetch pays the full
        # round-trip latency (~30 ms), so observe() returning four buffers
        # costs 4x that. Pack (pose6, vel6, force, brightness, img) into ONE
        # flat vector on device and split on host: one fetch per observation.
        def _observe_packed(s):
            pose, vel, force, img = env.observe(s)
            return jnp.concatenate([
                pose.astype(jnp.float32), vel.astype(jnp.float32),
                jnp.ravel(force).astype(jnp.float32),
                jnp.reshape(s.brightness, (1,)).astype(jnp.float32),
                jnp.ravel(img).astype(jnp.float32),
            ])

        self._observe = jax.jit(_observe_packed)
        # derive the packed split offsets from the env's actual observation
        # shapes (a multi-element force must not silently shift the
        # brightness slot or corrupt the image reshape)
        obs_shapes = jax.eval_shape(env.observe, env_state)
        self._force_size = int(np.prod(obs_shapes[2].shape)) or 1
        self._img_shape = tuple(obs_shapes[3].shape)
        self.last_brightness = 1.0

        # Device-resident fast path (HostLoopRunner pipeline mode): command
        # + observe fused into ONE dispatch whose packed observation STAYS
        # on device — the host loop feeds it straight into the absorb/plan
        # program instead of paying a ~30 ms image fetch that immediately
        # bounces back to the device. Only the 13+nf-float watchdog slice
        # (pose6, vel6, force, brightness) ever crosses to the host.
        nsmall = 13 + self._force_size

        def _cmd_observe(s, cmd7):
            v = cmd7[:6]
            b = jnp.where(cmd7[6] >= 0, cmd7[6], s.brightness)
            s2 = env.step_vel(s, v, b)
            flat = _observe_packed(s2)
            return s2, flat, flat[:nsmall]

        self._cmd_observe = jax.jit(_cmd_observe)
        # the UN-jitted pure form: HostLoopRunner inlines it into its fused
        # cmd+observe+absorb+plan program so a steady-state step costs ONE
        # dispatch (cmd_observe_device + a separate absorb dispatch costs
        # two tunnel round-trips). Exposed only by SyntheticBridge — a real
        # robot's command must cross the host boundary.
        self.cmd_observe_pure = _cmd_observe

    def klerg_cmd(self, twist6, brightness: float = -1.0) -> bool:
        if self.pause.paused:
            return False
        v = np.asarray(twist6, np.float32)
        if brightness < 0:
            self.state = self._step_vel(self.state, v)
        else:
            self.state = self._step_vel_b(self.state, v, brightness)
        return True

    def klerg_pose(self, pose6, brightness: float = -1.0) -> bool:
        if self.pause.paused:
            return False
        p = np.asarray(pose6, np.float32)
        if brightness < 0:
            self.state = self._step_pose(self.state, p)
        else:
            self.state = self._step_pose_b(self.state, p, brightness)
        return True

    def klerg_start_pose(self):
        return np.asarray(self.state.pose)

    def observe(self):
        flat = np.asarray(self._observe(self.state))  # one device fetch
        nf = self._force_size
        self.last_brightness = float(flat[12 + nf])
        return (flat[:6], flat[6:12], flat[12:12 + nf],
                flat[13 + nf:].reshape(self._img_shape))

    # ---- device-resident fast path ----
    def device_fast_path_ok(self) -> bool:
        """The fused cmd+observe program bypasses klerg_cmd/observe, so the
        fast path is only sound when NEITHER has been overridden (test
        bridges that wedge/fail by overriding them fall back automatically
        to the host-side pipeline path)."""
        cls = type(self)
        return (cls.klerg_cmd is SyntheticBridge.klerg_cmd
                and cls.observe is SyntheticBridge.observe
                # instance-level monkeypatching (tests, shims) must also
                # disable the fused program, which would bypass it
                and "klerg_cmd" not in self.__dict__
                and "observe" not in self.__dict__)

    def cmd_observe_device(self, cmd7):
        """Apply [vel6 | brightness] and observe, in ONE device program.
        Returns (flat_obs, small) DEVICE arrays — the packed observation
        (pose6, vel6, force, b, img) and its watchdog prefix (no image) —
        with the small slice's host copy already in flight. None if paused
        (klerg_cmd parity)."""
        if self.pause.paused:
            return None
        self.state, flat, small = self._cmd_observe(
            self.state, np.asarray(cmd7, np.float32))
        small.copy_to_host_async()
        return flat, small


class StaleObservationError(RuntimeError):
    """Raised when the camera frame is older than the lost-connection
    threshold (parity: got_img=False on a >1 s-old stamp,
    sensor_utils.py:486-489). The host loop treats it like a failed
    service call: pause, let the recovery heartbeat resume."""


class StampedCache:
    """Small ring of (stamp, value) pairs with closest-stamp lookup — the
    rospy message_filters.Cache getElemBeforeTime/getElemAfterTime
    selection the reference uses to align pose/vel/force/brightness streams
    to each camera frame (sensor_utils.py:322-358)."""

    def __init__(self, maxlen: int = 64):
        from collections import deque

        self._buf = deque(maxlen=maxlen)
        self._lock = threading.Lock()

    def push(self, stamp: float, value):
        with self._lock:
            self._buf.append((float(stamp), value))

    def latest(self):
        with self._lock:
            return self._buf[-1] if self._buf else (None, None)

    def closest(self, t: float):
        """(stamp, value) of the cached element nearest ``t`` — the
        before/after pair collapses to a min over the ring."""
        with self._lock:
            if not self._buf:
                return None, None
            return min(self._buf, key=lambda sv: abs(sv[0] - t))

    def stamps(self):
        """All cached stamps, oldest first (loop-cadence diagnostics)."""
        with self._lock:
            return [s for s, _ in self._buf]


@dataclass
class NativeBridge(RobotBridge):
    """Back the service surface with the native controller mux running a
    1 kHz loop against a robot driver.

    ``driver`` supplies the RT plant: ``driver.state() -> (pose6, vel6,
    wrench6)`` and ``driver.apply_velocity(twist6)`` /
    ``driver.apply_pose(pose16)``. ``camera() -> image | (image, stamp)``
    supplies frames. The loop thread is the stand-in for franka_control's
    RT callback; it stamps every state sample into caches so ``observe``
    returns the pose/vel/wrench closest in time to the camera frame
    (the reference's message-stamp alignment, sensor_utils.py:322-358).
    """

    driver: object
    camera: Optional[Callable] = None
    dt: float = 1e-3
    cmd_dt: float = 0.1
    max_force: float = 30.0
    max_img_age: float = 1.0  # lost-connection threshold (:486-489)
    clock: Callable = time.monotonic
    pause: PauseManager = field(default_factory=PauseManager)
    # optional peripheral: commanded brightness ('b' explorable state) is
    # applied through a BrightnessNode (hw/peripherals.py) — the role of the
    # reference's /update_brightness publish consumed by the
    # conditional_brightness / lamp_brightness nodes.
    brightness_node: Optional[object] = None
    _thread: Optional[threading.Thread] = None
    _running: bool = False

    def __post_init__(self):
        from .native import NativeControllers, ControlMode

        self._ControlMode = ControlMode
        self.mux = NativeControllers(self.dt, self.cmd_dt, self.max_force)
        self._state_cache = StampedCache()
        self._native_loop = None

    # ---- 1 kHz loop ----
    # Pacing lives in C++ (native/src/rt_loop.cpp): absolute-deadline
    # clock_nanosleep driving mux ticks — the stand-in for franka_control's
    # RT callback (cartesian_vel_interface.cpp:119-197). Measured on this
    # box: ~990 Hz sustained, ~0.1 ms mean jitter (all-native plant), ~955 Hz
    # with a ctypes-wrapped Python driver in the tick path. A test-injected
    # ``clock`` forces the legacy Python-paced thread (deterministic-time SIL
    # wedges need to own the clock).
    def start(self):
        if self.clock is time.monotonic:
            from .native import NativeLoop

            self._native_loop = NativeLoop(self.mux, self.dt,
                                           driver=self.driver)
            self._native_loop.start()
            return
        self._running = True
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def stop(self):
        if self._native_loop is not None:
            self._native_loop.stop()
            return
        self._running = False
        if self._thread:
            self._thread.join(timeout=1.0)

    def loop_stats(self) -> Optional[dict]:
        """Achieved tick rate / jitter / missed-deadline stats of the
        native loop (None under the legacy Python pacing)."""
        return self._native_loop.stats() if self._native_loop else None

    def _loop(self):
        CM = self._ControlMode
        while self._running:
            pose6, vel6, wrench6 = self.driver.state()
            self._state_cache.push(self.clock(), (pose6, vel6, wrench6))
            self.mux.set_wrench(wrench6)
            if self.mux.mode == CM.VELOCITY:
                self.driver.apply_velocity(self.mux.tick_velocity())
            elif self.mux.mode == CM.POSE:
                self.driver.apply_pose(self.mux.tick_pose(self.driver.pose_matrix()))
            time.sleep(self.dt)

    def success_rate(self) -> float:
        """The ``control_command_success_rate`` stand-in (franka's RT
        deadline-hit ratio the reference reads per command,
        cartesian_vel_interface.cpp:216-219): the achieved fraction of
        expected ``1/dt`` control ticks over the recent window. 1.0 before
        the loop starts (no evidence of degradation yet)."""
        if self._native_loop is not None:
            s = self._native_loop.stats()
            if s["ticks"] <= 0 or s["elapsed_s"] <= 0:
                return 1.0
            return min(1.0, s["rate_hz"] * self.dt)
        stamps = self._state_cache.stamps()
        if len(stamps) < 2:
            return 1.0
        window = stamps[-1] - stamps[0]
        if window <= 0:
            return 1.0
        return min(1.0, (len(stamps) - 1) * self.dt / window)

    # ---- service surface ----
    def klerg_cmd(self, twist6, brightness: float = -1.0) -> bool:
        if self.pause.paused:
            return False
        if brightness >= 0 and self.brightness_node is not None:
            self.brightness_node.update(brightness)
        self.mux.switch_mode(self._ControlMode.VELOCITY)
        # the reference's cmd_callback answers success only when the RT
        # deadline-hit ratio is healthy, and resets the velocity ramp
        # otherwise ("robot stopped moving so need to ramp up again from
        # scratch", cartesian_vel_interface.cpp:216-219); the ramp reset
        # lives in VelFilter::command(rt_ok=false) on the C++ side, and the
        # False return makes the host loop pause until the recovery
        # heartbeat resumes
        rt_ok = self.success_rate() > 0.5
        return bool(self.mux.command_twist(np.asarray(twist6, np.float64),
                                           rt_ok))

    def klerg_pose(self, pose6, brightness: float = -1.0) -> bool:
        if self.pause.paused:
            return False
        # a driver without the pose interface can't execute pose commands
        # in ANY loop form: the C loop's pose branch no-ops on NULL vtable
        # entries (rt_loop.cpp:121-124) and the legacy Python loop would
        # AttributeError inside the daemon thread — reject loudly rather
        # than report a success the robot will never execute
        if not (hasattr(self.driver, "apply_pose")
                and hasattr(self.driver, "pose_matrix")
                and hasattr(self.driver, "pose_to_matrix")):
            return False
        if brightness >= 0 and self.brightness_node is not None:
            self.brightness_node.update(brightness)
        self.mux.switch_mode(self._ControlMode.POSE)
        self.mux.command_pose(self.driver.pose_to_matrix(pose6))
        return True

    def klerg_start_pose(self):
        return np.asarray(self.driver.state()[0])

    def observe(self):
        """Stamp-aligned (pose6, vel6, force, image): the state sample
        closest in time to the camera frame; stale frames raise
        StaleObservationError (got_img=False semantics)."""
        now = self.clock()
        img, img_stamp = None, now
        if self.camera:
            frame = self.camera()
            if isinstance(frame, tuple):
                img, img_stamp = frame
            else:
                img = frame
        if img is not None and now - img_stamp > self.max_img_age:
            raise StaleObservationError(
                f"camera frame is {now - img_stamp:.2f}s old "
                f"(threshold {self.max_img_age}s) — connection lost?"
            )
        if self._native_loop is not None:
            hit = self._native_loop.state_closest(img_stamp)
            state = hit[1:] if hit else None
        else:
            _, state = self._state_cache.closest(img_stamp)
        if state is None:  # loop not started yet: fall back to direct read
            state = self.driver.state()
        pose6, vel6, wrench6 = state
        force = np.linalg.norm(np.asarray(wrench6)[:3], keepdims=True)
        return np.asarray(pose6), np.asarray(vel6), force, img

    def state_latest(self):
        """Freshest (pose6, vel6) from the live 1 kHz state ring, or None
        before the loop starts. The planner-facing view: the reference's
        continuously-refreshed ROS caches always hand the planner the
        newest pose/vel, while ``observe`` stays camera-stamp-aligned."""
        if self._native_loop is not None:
            hit = self._native_loop.state_latest()
            if hit is not None:
                return np.asarray(hit[1]), np.asarray(hit[2])
        else:
            _, state = self._state_cache.latest()
            if state is not None:
                return np.asarray(state[0]), np.asarray(state[1])
        return None

    def reset(self):
        self.mux.switch_mode(self._ControlMode.VELOCITY)

    def switch_controller(self, mode: str):
        self.mux.switch_mode(
            self._ControlMode.POSE if mode == "pose" else self._ControlMode.VELOCITY
        )


def _matrix_to_quat(R):
    """Rotation matrix -> (x, y, z, w) quaternion (Shepperd's method)."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([(R[2, 1] - R[1, 2]) / s, (R[0, 2] - R[2, 0]) / s,
                         (R[1, 0] - R[0, 1]) / s, 0.25 * s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 0.0)) * 2
    q = np.zeros(4)
    q[i] = 0.25 * s
    q[j] = (R[j, i] + R[i, j]) / s
    q[k] = (R[k, i] + R[i, k]) / s
    q[3] = (R[k, j] - R[j, k]) / s
    return q


def _quat_to_matrix(q):
    """(x, y, z, w) quaternion -> rotation matrix."""
    x, y, z, w = np.asarray(q, np.float64) / np.linalg.norm(q)
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


class RosBridgeServer:
    """The reference's actual ROS surface over a RobotBridge
    (franka_module.py:108-131): the `/klerg_cmd` (UpdateVel), `/klerg_pose`
    (UpdateState), `/klerg_start_pose` (GetStartState) services; the
    `/reset`, `/reset_joints`, `/pause`, `/resume` Empty topics; and the
    `/ee_pose`, `/ee_vel`, `/ee_wrench` state publishers.

    ``ros``/``srv``/``geom`` are the rospy module and message packages —
    injectable so the full service logic is software-in-the-loop testable
    without a ROS install (tests/test_host_loop.py); ``serve_ros`` resolves
    the real ones.
    """

    def __init__(self, bridge: RobotBridge, ros, srv, geom,
                 node_name: str = "ealv_bridge", rate_hz: float = 100.0):
        from ..utils.rotations import euler_angles_to_matrix, matrix_to_euler_angles
        self._e2m = lambda a: np.asarray(euler_angles_to_matrix(
            np.asarray(a, np.float32), "XYZ"))
        self._m2e = lambda R: np.asarray(matrix_to_euler_angles(
            np.asarray(R, np.float32), "XYZ"))
        self.bridge = bridge
        self.ros = ros
        self.srv = srv
        self.geom = geom
        self.rate_hz = rate_hz
        ros.init_node(node_name)
        self.services = [
            ros.Service("/klerg_start_pose", srv.GetStartState, self.start_cb),
            ros.Service("/klerg_cmd", srv.UpdateVel, self.vel_cb),
            ros.Service("/klerg_pose", srv.UpdateState, self.pose_cb),
        ]
        self.subs = [
            ros.Subscriber("/reset", srv.Empty, lambda _m: bridge.reset()),
            ros.Subscriber("/reset_joints", srv.Empty, lambda _m: bridge.reset()),
            ros.Subscriber("/pause", srv.Empty, self._pause_cb),
            ros.Subscriber("/resume", srv.Empty, self._resume_cb),
        ]
        self.pose_pub = ros.Publisher("/ee_pose", geom.PoseStamped, queue_size=1)
        self.vel_pub = ros.Publisher("/ee_vel", geom.TwistStamped, queue_size=1)
        self.wrench_pub = ros.Publisher("/ee_wrench", geom.WrenchStamped,
                                        queue_size=1)

    # ---- message conversion (pose6 = xyz + extrinsic-XYZ euler) ----
    def _pose_msg(self, pose6):
        msg = self.geom.Pose()
        msg.position.x, msg.position.y, msg.position.z = map(float, pose6[:3])
        q = _matrix_to_quat(self._e2m(pose6[3:6]))
        (msg.orientation.x, msg.orientation.y,
         msg.orientation.z, msg.orientation.w) = map(float, q)
        return msg

    def _msg_pose6(self, msg):
        q = [msg.orientation.x, msg.orientation.y, msg.orientation.z,
             msg.orientation.w]
        rpw = self._m2e(_quat_to_matrix(q))
        return np.array([msg.position.x, msg.position.y, msg.position.z,
                         *rpw], np.float32)

    # ---- service callbacks (velCallback/poseCallback/startCallback,
    # franka_module.py:261-347) ----
    def vel_cb(self, req):
        t = req.desired_vel
        twist6 = np.array([t.linear.x, t.linear.y, t.linear.z,
                           t.angular.x, t.angular.y, t.angular.z], np.float32)
        ok = self.bridge.klerg_cmd(twist6, float(req.desired_brightness))
        return self.srv.UpdateVelResponse(
            self._pose_msg(self.bridge.klerg_start_pose()), bool(ok))

    def pose_cb(self, req):
        pose6 = self._msg_pose6(req.desired_pose)
        ok = self.bridge.klerg_pose(pose6, float(req.desired_brightness))
        return self.srv.UpdateStateResponse(
            self._pose_msg(self.bridge.klerg_start_pose()), bool(ok))

    def start_cb(self, _req):
        return self.srv.GetStartStateResponse(
            self._pose_msg(self.bridge.klerg_start_pose()), True)

    def _pause_cb(self, _msg):
        pause = getattr(self.bridge, "pause", None)
        if pause is not None:
            pause.pause()

    def _resume_cb(self, _msg):
        pause = getattr(self.bridge, "pause", None)
        if pause is not None:
            pause.resume()

    # ---- state publishing (the 100 Hz pose/vel/wrench publishers) ----
    def publish_once(self):
        pose6, vel6, force, _img = self.bridge.observe()
        ps = self.geom.PoseStamped()
        ps.pose = self._pose_msg(pose6)
        self.pose_pub.publish(ps)
        tw = self.geom.TwistStamped()
        (tw.twist.linear.x, tw.twist.linear.y, tw.twist.linear.z) = map(
            float, vel6[:3])
        (tw.twist.angular.x, tw.twist.angular.y, tw.twist.angular.z) = map(
            float, vel6[3:6])
        self.vel_pub.publish(tw)
        wr = self.geom.WrenchStamped()
        wr.wrench.force.z = float(np.ravel(force)[0])
        self.wrench_pub.publish(wr)

    def spin(self):  # pragma: no cover - needs a live roscore
        rate = self.ros.Rate(self.rate_hz)
        while not self.ros.is_shutdown():
            self.publish_once()
            rate.sleep()


def serve_ros(bridge: RobotBridge, node_name: str = "ealv_bridge",
              rate_hz: float = 100.0, spin: bool = True):
    """Serve a RobotBridge as the reference's ROS services/topics.

    Resolves rospy + the franka_test srv/geometry_msgs packages; the full
    server logic lives in RosBridgeServer (SIL-tested with injected
    stand-ins — only this resolution shim needs a real ROS install).
    """
    try:  # pragma: no cover - needs a ROS install
        import rospy
        import geometry_msgs.msg as geom
        from franka_test import srv as fsrv
        from std_msgs.msg import Empty as _EmptyMsg
    except ImportError as e:
        raise ImportError(
            "serve_ros needs a ROS environment (rospy + franka_test msgs); "
            "this image has none. RosBridgeServer holds the full service "
            "logic and accepts injected ros/srv/geom modules."
        ) from e

    class _Srv:  # pragma: no cover
        GetStartState = fsrv.GetStartState
        GetStartStateResponse = fsrv.GetStartStateResponse
        UpdateVel = fsrv.UpdateVel
        UpdateVelResponse = fsrv.UpdateVelResponse
        UpdateState = fsrv.UpdateState
        UpdateStateResponse = fsrv.UpdateStateResponse
        # NB: a bare `Empty = Empty` here is a NameError — class bodies do
        # not close over the enclosing function scope for shadowed names
        Empty = _EmptyMsg

    server = RosBridgeServer(bridge, rospy, _Srv, geom,
                             node_name=node_name, rate_hz=rate_hz)
    if spin:  # pragma: no cover
        server.spin()
    return server
