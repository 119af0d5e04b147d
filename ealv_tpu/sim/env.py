"""Synthetic Franka-like environment, fully jittable.

Role parity: FrankaEnv + FrankaBridge (franka_test/scripts/franka/
franka_env.py:19-374, franka_module.py:24-355): accepts EE velocity or pose
commands, integrates the pose inside the tray workspace, renders the wrist
camera, and reports (pose, vel, force, image, brightness). The contact force
rises when the EE presses below an object's height at its (x, y) (stand-in
for the FT sensor + gravity compensation path, franka_env.py:268-284).

The reference's PyBullet twin runs on the host behind ROS services; this
environment is a pure function over an ``EnvState`` pytree so the WHOLE
explore->learn experiment can live in one lax.scan on device. A real
PyBullet backend can be slotted behind the same step signature on hosts
that have it (this image does not ship pybullet).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .renderer import TrayScene, render_camera


class EnvState(NamedTuple):
    pose: jax.Array  # (6,) x y z r p w (tray coords)
    vel: jax.Array  # (6,)
    brightness: jax.Array  # ()
    scene: TrayScene


@dataclasses.dataclass(frozen=True)
class SyntheticEnv:
    """Static env config. ``tray_lim``: (6, 2) pose box; dt matches the
    control period (run.launch dt=0.2, sim /5 -> 0.04, sensor_utils.py:90-99).
    """

    tray_lim: tuple  # ((lo, hi) x 6)
    dt: float = 0.04
    img_hw: tuple = (180, 180)
    max_force: float = 30.0  # test_config.yaml:24
    vel_alpha: float = 0.7  # EMA toward commanded twist (cartesian_vel_interface.cpp:168-182)

    def _lims(self):
        return jnp.asarray(self.tray_lim, jnp.float32)

    def init(self, pose0, scene: TrayScene | None = None, brightness=1.0) -> EnvState:
        return EnvState(
            pose=jnp.asarray(pose0, jnp.float32),
            vel=jnp.zeros(6, jnp.float32),
            brightness=jnp.asarray(brightness, jnp.float32),
            scene=scene if scene is not None else TrayScene.default(),
        )

    def _contact_force(self, pose, scene: TrayScene):
        """Soft contact: pressing below an object's height produces a normal
        force, clipped at max_force."""
        d2 = jnp.sum((pose[None, :2] - scene.obj_xy) ** 2, axis=1)
        over = jnp.exp(-0.5 * d2 / scene.obj_radius**2)
        top = jnp.max(over * scene.obj_height)
        pen = jnp.maximum(top - pose[2], 0.0)
        return jnp.clip(pen * 500.0, 0.0, self.max_force)

    def step_vel(self, s: EnvState, cmd_vel, cmd_brightness=None) -> EnvState:
        """Velocity command (parity: FrankaEnv.step use_vel path :207-237 +
        the C++ controller's EMA ramp + force-aware clipping,
        franka_module.py:265-293)."""
        cmd_vel = jnp.asarray(cmd_vel, jnp.float32)
        force = self._contact_force(s.pose, s.scene)
        # block further downward motion under high force (velCallback :275-290)
        blocked = force > 0.75 * self.max_force
        cmd_z = jnp.where(blocked & (cmd_vel[2] < 0), 0.0, cmd_vel[2])
        cmd_vel = cmd_vel.at[2].set(cmd_z)
        vel = self.vel_alpha * cmd_vel + (1 - self.vel_alpha) * s.vel
        lims = self._lims()
        pose = jnp.clip(s.pose + vel * self.dt, lims[:, 0], lims[:, 1])
        b = s.brightness if cmd_brightness is None else jnp.asarray(cmd_brightness)
        return s._replace(pose=pose, vel=vel, brightness=b)

    def step_pose(self, s: EnvState, cmd_pose, cmd_brightness=None) -> EnvState:
        """Pose command (parity: IK position-control path :238-244 with the
        double low-pass of cartesian_pose_interface.cpp:149-151 collapsed to
        one smoothing constant)."""
        cmd_pose = jnp.asarray(cmd_pose, jnp.float32)
        lims = self._lims()
        target = jnp.clip(cmd_pose, lims[:, 0], lims[:, 1])
        pose = 0.7 * target + 0.3 * s.pose
        vel = (pose - s.pose) / self.dt
        b = s.brightness if cmd_brightness is None else jnp.asarray(cmd_brightness)
        return s._replace(pose=pose, vel=vel, brightness=b)

    def observe(self, s: EnvState):
        """(pose, vel, force, image) — the synced sensor tuple the reference
        assembles from ROS caches (sensor_utils.get_latest_msg :479-547)."""
        img = render_camera(s.scene, s.pose, s.brightness, self.img_hw)
        force = self._contact_force(s.pose, s.scene)
        return s.pose, s.vel, force[None], img
