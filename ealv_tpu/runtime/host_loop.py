"""Host-in-the-loop experiment runtime — the robustness layer, wired.

Parity targets:
  - service-exception -> pause + recovery (sensor_main_module.py:153-166),
  - stuck-pose detection + force-direction escape command
    (sensor_utils.check_cmd :444-457, vel_move_force_norm :460-476),
  - goal-seek retry loop with joint reset + yaw-unstick
    (sensor_utils.check_goal_pos :375-441),
  - the random_listener auto-recovery heartbeat (scripts/random_listener:44-117),
  - pause/resume/manual/save topic surface (sensor_utils :556-578) via
    ControlPanel/ControlHooks.

The fused device loop (Experiment.run_chunk) has no I/O to fail, so it needs
none of this. This runtime drives the SAME jitted plan/absorb programs
(Experiment.plan_step / absorb_step) but routes commands and sensing through
a RobotBridge (synthetic sim, native C++ mux, or a real robot driver) — the
deployment shape where commands can fail, robots wedge, and operators press
pause. Every recovery event is logged to the MetricsLog.
"""

from __future__ import annotations

from dataclasses import KW_ONLY, dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .agent import Experiment, ExperimentState
from .metrics import MetricsLog
from .panel import ControlHooks
from .watchdog import (
    GoalSeeker,
    GracefulKiller,
    PauseManager,
    RecoveryHeartbeat,
    StuckDetector,
)


@dataclass
class HostLoopRunner:
    """Drive an Experiment through a RobotBridge with failure handling.

    ``exp`` supplies the jitted plan/absorb halves; ``bridge`` the command/
    observe surface. The watchdog objects are created with defaults when not
    given, and are all exercised by ``step``/``run``:

      * command failure or exception -> pause (+ log), heartbeat auto-recovers
      * ||dpose|| < stuck tol        -> force-direction escape command (+ log)
      * pause flag                   -> no motion commands until resume
      * save request                 -> surfaced to the caller via callback
    """

    exp: Experiment
    bridge: object
    # Everything below is keyword-only: the runner grew fields over time and
    # a positional third argument (historically ``metrics``) must not
    # silently rebind to a newer field.
    _: KW_ONLY
    # Pipelined stepping (default): the plan for step t+1 is computed INSIDE
    # the same device program that absorbs step t's observation, so each
    # step pays one observe fetch + one (overlapped) command fetch instead
    # of three serialized tunnel round-trips. The planner consumes exactly
    # the same observation it would in serial mode (the one cached at the
    # end of the previous step) — no added staleness; the reference's async
    # design likewise never blocks control on anything
    # (trainer_ddp.py:117-131, main_async.py:62-78).
    pipeline: bool = True
    # When the bridge offers a fused device-resident cmd+observe
    # (SyntheticBridge.cmd_observe_device), the pipelined step keeps the
    # observation on device entirely (see _step_fast). Disable to force the
    # host-side pipelined path (e.g. for A/B measurement).
    device_fast: bool = True
    metrics: Optional[MetricsLog] = None
    stuck: StuckDetector = field(default_factory=StuckDetector)
    pause: Optional[PauseManager] = None
    heartbeat: RecoveryHeartbeat = field(
        default_factory=lambda: RecoveryHeartbeat(period_s=5.0, timeout_s=0.5)
    )
    seeker: GoalSeeker = field(default_factory=GoalSeeker)
    killer: Optional[GracefulKiller] = None
    save_fn: Optional[object] = None  # callable(es) on save requests
    events: list = field(default_factory=list)

    def __post_init__(self):
        # share the bridge's pause manager so panel/bridge/watchdog agree
        if self.pause is None:
            self.pause = getattr(self.bridge, "pause", None) or PauseManager()
        if self.metrics is None:
            self.metrics = MetricsLog(None, echo=False)
        exp = self.exp
        s_dim = exp.cfg.s_dim

        # Over a tunneled TPU every dispatch/fetch pays ~30 ms, so the step
        # is built around ONE dispatch per half (plan, absorb) and ONE fetch
        # for the command: raw host observations go straight into the jitted
        # programs (the tray->robot conversion runs inside them — an eager
        # _robot_state_from_obs costs several round-trips), and the plan's
        # (vel6, b_cmd) pair comes back as a single packed (7,) buffer.
        def _plan_cmd7(es, pose6, vel6, b):
            # the single definition of the packed-command convention:
            # cmd7 = [vel6 | brightness, -1.0 = keep current]. All three
            # step forms (serial, host-pipelined, device-resident) plan
            # through here so the convention cannot desynchronize.
            full_state = exp._robot_state_from_obs(pose6, vel6, b)
            pstate, vel6_cmd, b_cmd, info = exp.plan_step(es, full_state)
            cmd7 = jnp.concatenate([
                vel6_cmd,
                jnp.full((1,), -1.0) if b_cmd is None
                else jnp.reshape(b_cmd, (1,)),
            ])
            return pstate, cmd7, info

        def _plan_obs(es, pose6, vel6, b):
            return _plan_cmd7(es, pose6, vel6, b)

        def _absorb_obs(es, pstate, info, pose6, vel6, b, img, force):
            robot_state = exp._robot_state_from_obs(pose6, vel6, b)[:s_dim]
            return exp.absorb_step(es, pstate, info, robot_state, img, force)

        # fused absorb(t) + plan(t+1): one dispatch per step in pipeline
        # mode. ``plan_pose6/plan_vel6`` let the plan consume a FRESHER
        # state than the camera-stamped one being absorbed (NativeBridge's
        # live 1 kHz ring — the reference's continuously-refreshed caches);
        # on bridges without a live loop they are the same arrays.
        def _absorb_plan_obs(es, pstate, info, pose6, vel6, b, img, force,
                             plan_pose6, plan_vel6, plan_b):
            robot_state = exp._robot_state_from_obs(pose6, vel6, b)[:s_dim]
            es, tick_info = exp.absorb_step(es, pstate, info, robot_state,
                                            img, force)
            pstate2, cmd7, info2 = _plan_cmd7(
                es, plan_pose6, plan_vel6, plan_b)
            return es, pstate2, cmd7, info2, tick_info

        self._plan = jax.jit(_plan_obs)
        self._absorb = jax.jit(_absorb_obs)
        self._absorb_plan = jax.jit(_absorb_plan_obs)
        self._obs = None  # last sensed (pose6, vel6, force, img), host-side
        self._pending = None  # pipelined (pstate, info, cmd7 device array)
        self._prev_small = None  # fused path: deferred watchdog slice

        # Device-resident fast path: when the bridge can fuse command +
        # observe into one device program whose observation never leaves
        # the device (SyntheticBridge.cmd_observe_device), the absorb/plan
        # half consumes the PACKED observation directly — the per-step
        # host traffic drops to two small in-flight copies (the (7,)
        # command and the 13+nf-float watchdog slice) instead of a full
        # image fetch that bounces straight back to the device. Semantics
        # are unchanged: same observation, same plan inputs, same
        # robustness checks (stuck detection runs on the watchdog slice
        # at the end of the step; on a hit the pipeline is invalidated and
        # the escape handled by the standard path).
        self._fast = bool(self.pipeline) and bool(self.device_fast) and bool(
            getattr(self.bridge, "device_fast_path_ok", lambda: False)())
        self._cmd_absorb_plan = None  # set below when the bridge allows it
        if self._fast:
            nf = int(getattr(self.bridge, "_force_size", 1))
            img_shape = tuple(self.bridge._img_shape)
            self._nf = nf

            def _absorb_plan_flat(es, pstate, info, flat):
                pose6, vel6 = flat[:6], flat[6:12]
                b = flat[12 + nf]
                img = jnp.reshape(flat[13 + nf:], img_shape)
                robot_state = exp._robot_state_from_obs(
                    pose6, vel6, b)[:s_dim]
                # the full nf-element force slice: absorb_step reduces a
                # multi-axis wrench to ||F|| for the (cap, 1) replay ring
                es, tick_info = exp.absorb_step(
                    es, pstate, info, robot_state, img, flat[12:12 + nf])
                pstate2, cmd7, info2 = _plan_cmd7(es, pose6, vel6, b)
                return es, pstate2, cmd7, info2, tick_info

            self._absorb_plan_flat = jax.jit(_absorb_plan_flat)

            # Single-dispatch steady state: when the bridge also exposes
            # the UN-jitted cmd+observe (SyntheticBridge.cmd_observe_pure),
            # fuse it WITH the absorb/plan half into ONE program. A
            # steady-state step then pays one dispatch + two small
            # in-flight copies instead of two dispatches — on a ~30 ms-RTT
            # tunnel that is the two-dispatch path's dominant cost. The
            # command itself never crosses the host boundary (its async
            # copy still lands for the watchdog/event layer). Guarded on
            # the exact class method so a subclass that customizes
            # cmd_observe_device keeps its override in the loop.
            from ealv_tpu.hw.bridge import SyntheticBridge
            pure = getattr(self.bridge, "cmd_observe_pure", None)
            if pure is not None and (
                    type(self.bridge).cmd_observe_device
                    is not SyntheticBridge.cmd_observe_device
                    # instance-level monkeypatching (tests, shims) must
                    # also keep its override in the loop
                    or "cmd_observe_device" in self.bridge.__dict__):
                pure = None

            if pure is not None:
                # compose the un-jitted closures so the packed-observation
                # convention lives in exactly one place (_absorb_plan_flat)
                def _cmd_absorb_plan(es, pstate, info, env_s, cmd7):
                    env_s2, flat, small = pure(env_s, cmd7)
                    es, pstate2, cmd7n, info2, tick_info = (
                        _absorb_plan_flat(es, pstate, info, flat))
                    return (es, pstate2, cmd7n, info2, tick_info,
                            env_s2, small)

                self._cmd_absorb_plan = jax.jit(_cmd_absorb_plan)

    # ------------------------------------------------------------------
    def hooks(self) -> ControlHooks:
        """ControlHooks for a ControlPanel driving this runner."""
        return ControlHooks(
            pause_mgr=self.pause,
            reset_fn=self.bridge.reset,
            recover_fn=self._recover,
            switch_mode_fn=self.bridge.switch_controller,
        )

    def _log(self, kind: str, msg: str):
        self.events.append(kind)
        self.metrics.write_to_log(f"[{kind}] {msg}")

    def _recover(self):
        """Recovery escalation: clear controllers, re-level (random_listener
        parity: ErrorRecoveryActionGoal + EE re-align)."""
        self.bridge.reset()
        self._obs = None  # pose may have jumped; re-sense before planning
        self._pending = None  # any in-flight plan is now stale
        self._prev_small = None  # deferred watchdog slice is pre-reset
        self._log("recover", "bridge reset + controller re-arm")

    # ------------------------------------------------------------------
    def drive_to_start(self, goal_pose6, yaw_index: Optional[int] = None):
        """Goal-seek retry loop to the start pose (check_goal_pos parity):
        pose commands with retries, joint/controller reset at half budget,
        yaw-unstick nudges. Returns (reached, final_pose)."""

        def attempt(goal):
            self.bridge.klerg_pose(np.asarray(goal))
            return np.asarray(self.bridge.observe()[0])

        ok, pos = self.seeker.seek(
            np.asarray(goal_pose6), attempt, reset_fn=self._recover,
            yaw_index=yaw_index,
        )
        self._obs = None  # moved: next step must re-sense
        self._pending = None
        self._prev_small = None
        if not ok:
            self._log("goal_seek_failed",
                      f"goal {np.round(np.asarray(goal_pose6), 3)} "
                      f"reached {np.round(pos, 3)}")
        return ok, pos

    # ------------------------------------------------------------------
    def step(self, es: ExperimentState) -> ExperimentState:
        """One explore+learn step through the bridge with failure handling."""
        self.heartbeat.tick(self.pause, recover_fn=self._recover)
        if self.pause.paused or self.pause.manual:
            # the operator may move the robot while paused/manual: any
            # in-flight plan (and the cached frame it came from) is stale
            self._pending = None
            self._obs = None
            self._prev_small = None
            return es  # no motion while paused/manual (sensor_utils :556-578)

        if self._fast:
            return self._step_fast(es)

        if self.pipeline and self._pending is not None:
            # steady state: the plan was dispatched fused with the previous
            # absorb, and its host copy has been in flight since then
            pstate, info, cmd7_dev = self._pending
            self._pending = None
            cmd7 = np.asarray(cmd7_dev)
        else:
            # prime (first step, or after recover/goal-seek/pause): plan
            # from the latest cached camera-sync observation, as serial
            # mode always does
            if self._obs is None:
                self._obs = self.bridge.observe()
            pose6, vel6, _, _ = self._obs
            pstate, cmd7, info = self._plan(
                es, np.asarray(pose6), np.asarray(vel6),
                self._brightness(pose6))
            cmd7 = np.asarray(cmd7)  # one fetch: [vel6 | brightness command]

        try:
            ok = self.bridge.klerg_cmd(cmd7[:6], float(cmd7[6]))
        except Exception as e:  # service-exception parity (:153-166)
            ok = False
            self._log("cmd_error", repr(e))
        if not ok:
            self.pause.pause()
            self._log("cmd_failed", "velocity command rejected; pausing")
            return es

        pose2, vel2, force2, img2 = self.bridge.observe()

        # stuck detection + force-direction escape (check_cmd parity)
        moved_ok, escape = self.stuck.check(pose2, force=self._escape_force(force2))
        if not moved_ok:
            if escape is not None:
                esc6 = np.zeros(6)
                esc6[:3] = escape[:3] if escape.shape[0] >= 3 else np.pad(
                    escape, (0, 3 - escape.shape[0]))
                try:
                    self.bridge.klerg_cmd(esc6, -1.0)
                except Exception as e:
                    self._log("cmd_error", repr(e))
                self._log("stuck_escape",
                          f"pose {np.round(np.asarray(pose2)[:3], 4)} "
                          f"escape {np.round(esc6[:3], 4)}")
                pose2, vel2, force2, img2 = self.bridge.observe()
            else:
                self.bridge.reset()
                self._log("stuck_reset", "no force reading; controller reset")

        f = np.asarray(force2, np.float32).ravel()
        # absorb_step reduces a multi-axis wrench to ||F||; hand it a
        # stable 1-element view here so the jitted absorb signature does
        # not depend on the bridge's force width
        if f.size > 1:
            f = np.array([np.linalg.norm(f)], np.float32)
        elif not f.size:
            f = np.zeros(1, np.float32)
        if self.pipeline:
            # plan for the NEXT step rides the same dispatch as this absorb;
            # on a live-loop bridge it consumes the freshest ring state
            # (the reference's continuously-refreshed pose/vel caches)
            plan_pose, plan_vel = np.asarray(pose2), np.asarray(vel2)
            fresh = getattr(self.bridge, "state_latest", None)
            if fresh is not None:
                latest = fresh()
                if latest is not None:
                    plan_pose, plan_vel = latest
            es, pstate2, cmd7_next, info2, tick_info = self._absorb_plan(
                es, pstate, info, np.asarray(pose2), np.asarray(vel2),
                self._brightness(pose2), np.asarray(img2), f,
                plan_pose, plan_vel, self._brightness(plan_pose),
            )
            cmd7_next.copy_to_host_async()  # overlap with robot motion
            self._pending = (pstate2, info2, cmd7_next)
        else:
            es, tick_info = self._absorb(
                es, pstate, info, np.asarray(pose2), np.asarray(vel2),
                self._brightness(pose2), np.asarray(img2), f,
            )
        self._obs = (pose2, vel2, force2, img2)

        if self.pause.consume_save() and self.save_fn is not None:
            self.save_fn(es)
            self._log("save", f"checkpoint at step {int(es.explr_step)}")
        return es

    def run(self, es: ExperimentState, n_steps: int) -> ExperimentState:
        """Run n steps, honoring SIGINT/SIGTERM via GracefulKiller."""
        killer = self.killer or GracefulKiller(install=False)
        for _ in range(n_steps):
            if killer.kill_now:
                self._log("killed", "graceful shutdown requested")
                break
            es = self.step(es)
        # deferred-watchdog fused mode holds the last step's slice — check
        # it before returning so every absorbed frame is watchdog-checked
        # by the time a run() chunk hands control back to the caller
        small, self._prev_small = self._prev_small, None
        if small is not None:
            self._check_watchdog(small)
        return es

    # ------------------------------------------------------------------
    def _step_fast(self, es: ExperimentState) -> ExperimentState:
        """Device-resident pipelined step. With a fused-capable bridge
        (SyntheticBridge.cmd_observe_pure) the whole step —
        cmd+observe+absorb+plan — is ONE dispatch plus two small in-flight
        host copies; otherwise one cmd+observe dispatch and one absorb+plan
        dispatch. The image never crosses the host boundary either way."""
        if self._pending is None:
            # prime (first step, or after recover/goal-seek/pause/stuck):
            # plan from a fresh host observation, as the standard path does
            if self._obs is None:
                self._obs = self.bridge.observe()
            pose6, vel6, _, _ = self._obs
            pstate, cmd7_dev, info = self._plan(
                es, np.asarray(pose6), np.asarray(vel6),
                self._brightness(pose6))
        else:
            pstate, info, cmd7_dev = self._pending
            self._pending = None

        if self._cmd_absorb_plan is not None:
            # ONE dispatch: the command stays a device array end to end.
            # Re-check pause right before commanding (a panel/heartbeat
            # thread may have paused mid-step) — klerg_cmd parity.
            if self.pause.paused:
                self._log("cmd_failed",
                          "velocity command rejected; pausing")
                self._obs = None
                self._prev_small = None  # post-pause state is stale
                return es
            try:
                (es, pstate2, cmd7_next, info2, _tick_info, env_s2,
                 small) = self._cmd_absorb_plan(
                    es, pstate, info, self.bridge.state, cmd7_dev)
            except Exception as e:  # service-exception parity (:153-166)
                self.pause.pause()
                self._log("cmd_error", repr(e))
                self._log("cmd_failed",
                          "velocity command rejected; pausing")
                self._obs = None
                self._prev_small = None
                return es
            self.bridge.state = env_s2  # device handle; no fetch
            small.copy_to_host_async()
            self._pending = (pstate2, info2, cmd7_next)
            self._obs = None
            # Deferred watchdog: sync the PREVIOUS step's slice, not this
            # one. Syncing small_t here would stall the host until program
            # t finishes, leaving the device idle for a full tunnel RTT
            # between steps; checking t-1's slice AFTER dispatching t keeps
            # one program queued on the device at all times, so the step
            # rate approaches pure device time. Cost: a stuck hit is acted
            # on one frame later (the reference's check_cmd likewise
            # checks the previous loop iteration's cached state).
            # (on the first fused step there is nothing to check yet —
            # small becomes None and the watchdog block below is skipped)
            small, self._prev_small = self._prev_small, small
        else:
            cmd7 = np.asarray(cmd7_dev)  # copy in flight since dispatch
            try:
                res = self.bridge.cmd_observe_device(cmd7)
            except Exception as e:  # service-exception parity (:153-166)
                res = None
                self._log("cmd_error", repr(e))
            if res is None:
                self.pause.pause()
                self._log("cmd_failed", "velocity command rejected; pausing")
                self._obs = None
                return es
            flat, small = res

            es, pstate2, cmd7_next, info2, tick_info = (
                self._absorb_plan_flat(es, pstate, info, flat))
            cmd7_next.copy_to_host_async()  # overlap with robot motion
            self._pending = (pstate2, info2, cmd7_next)
            self._obs = None  # the fast path never holds a host-side image

        # watchdog slice: its copy has been in flight since before the
        # (next) dispatch, so this sync overlaps device work, not adds to it
        if small is not None:
            self._check_watchdog(small)

        if self.pause.consume_save() and self.save_fn is not None:
            self.save_fn(es)
            self._log("save", f"checkpoint at step {int(es.explr_step)}")
        return es

    def _check_watchdog(self, small):
        """Stuck detection + escape on a watchdog slice (fast-path form of
        the host-side check in step()). On a hit, invalidates the pipeline
        so the next step primes from a post-escape observation — unlike the
        host-side path (escape BEFORE absorb) the wedged frame was already
        absorbed (in deferred-watchdog fused mode, up to two frames): the
        rare-event tradeoff for the steady-state latency win."""
        small_h = np.asarray(small)
        pose2 = small_h[:6]
        force2 = small_h[12:12 + self._nf]
        moved_ok, escape = self.stuck.check(
            pose2, force=self._escape_force(force2))
        if moved_ok:
            return
        self._pending = None
        self._prev_small = None  # held slice predates the escape
        if escape is not None:
            esc6 = np.zeros(6)
            esc6[:3] = escape[:3] if escape.shape[0] >= 3 else np.pad(
                escape, (0, 3 - escape.shape[0]))
            try:
                self.bridge.klerg_cmd(esc6, -1.0)
            except Exception as e:
                self._log("cmd_error", repr(e))
            self._log("stuck_escape",
                      f"pose {np.round(pose2[:3], 4)} "
                      f"escape {np.round(esc6[:3], 4)}")
        else:
            self.bridge.reset()
            self._log("stuck_reset", "no force reading; controller reset")

    # ------------------------------------------------------------------
    def _brightness(self, pose6):
        lb = getattr(self.bridge, "last_brightness", None)
        if lb is not None:  # cached at observe() time: no device fetch
            return float(lb)
        # NativeBridge: the brightness actually applied to the lamp/camera
        # comes back from the BrightnessNode (the reference syncs the
        # published /usb_cam/brightness into the state vector,
        # sensor_utils.py:479-547) — without this the model would see a
        # constant 1.0 while the physical brightness varies
        bn = getattr(self.bridge, "brightness_node", None)
        if bn is not None:
            return float(bn.current)
        st = getattr(self.bridge, "state", None)
        if st is not None and hasattr(st, "brightness"):
            return float(st.brightness)
        return 1.0

    @staticmethod
    def _escape_force(force):
        f = np.asarray(force, np.float64).ravel()
        if f.size >= 3:
            return f[:3]
        # scalar force magnitude: no direction -> escape straight up
        # (the pose-guard z lift of cartesian_pose_interface.cpp:138-147)
        return np.array([0.0, 0.0, float(f[0]) if f.size else 0.0])
