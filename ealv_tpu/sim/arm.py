"""Joint-space 7-DOF arm simulator (Franka-like), fully jittable.

Fidelity parity targets (behavior, not the PyBullet engine):
  - EE-velocity control via Jacobian pseudo-inverse joint velocities with N
    sim substeps per command (franka_env.py:207-237),
  - pose control via iterative damped-least-squares IK + position servo
    (franka_env.py:238-244, maxNumIterations=50),
  - drift correction every 20 velocity commands when not controlling z/rp:
    an IK step pinning z and re-leveling roll/pitch
    (franka_module.updatePybullet :295-318),
  - joint reset to the home configuration (resetJointsCallback; the joint
    reset escalation of check_goal_pos :377-386),
  - FT reading from scene contact + camera from the wrist pose (same
    contact/render model as SyntheticEnv).

Unlike the free-flying SyntheticEnv, this model exhibits the failure modes
the robustness layer exists for: pinv-induced drift in uncontrolled axes,
joint-limit saturation (commands near the workspace edge stop tracking),
and kinematically-coupled yaw sticking — so goal-seek retries, yaw
unstick, and stuck detection can be exercised in sim.

Kinematics: standard Franka Panda modified-DH parameters (public spec).
The geometric Jacobian is assembled in the same fixed 8-link FK pass.
Exposes the same ``init / step_vel / step_pose / observe`` surface as
SyntheticEnv, so bridges and the Experiment are backend-agnostic.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .renderer import TrayScene, render_camera
from ..utils.rotations import euler_angles_to_matrix, matrix_to_euler_angles

# Panda modified-DH rows (a_{i-1}, d_i, alpha_{i-1}) and the flange offset.
_DH_A = jnp.asarray([0.0, 0.0, 0.0, 0.0825, -0.0825, 0.0, 0.088])
_DH_D = jnp.asarray([0.333, 0.0, 0.316, 0.0, 0.384, 0.0, 0.0])
_DH_ALPHA = jnp.asarray(
    [0.0, -jnp.pi / 2, jnp.pi / 2, jnp.pi / 2, -jnp.pi / 2, jnp.pi / 2, jnp.pi / 2]
)
_FLANGE_D = 0.107

Q_MIN = jnp.asarray([-2.8973, -1.7628, -2.8973, -3.0718, -2.8973, -0.0175, -2.8973])
Q_MAX = jnp.asarray([2.8973, 1.7628, 2.8973, -0.0698, 2.8973, 3.7525, 2.8973])
QD_MAX = jnp.asarray([2.175, 2.175, 2.175, 2.175, 2.61, 2.61, 2.61])
Q_HOME = jnp.asarray([0.0, -0.3135, 0.0, -2.0, 0.0, 1.8675, 0.0])


def _dh_transform(a, d, alpha, theta):
    """Modified-DH link transform (Craig convention)."""
    ct, st = jnp.cos(theta), jnp.sin(theta)
    ca, sa = jnp.cos(alpha), jnp.sin(alpha)
    return jnp.array([
        [ct, -st, 0.0, a],
        [st * ca, ct * ca, -sa, -d * sa],
        [st * sa, ct * sa, ca, d * ca],
        [0.0, 0.0, 0.0, 1.0],
    ])


def fk(q):
    """Forward kinematics: q (7,) -> (p_ee (3,), R_ee (3, 3))."""
    T = jnp.eye(4)
    for i in range(7):
        T = T @ _dh_transform(_DH_A[i], _DH_D[i], _DH_ALPHA[i], q[i])
    T = T @ jnp.diag(jnp.ones(4)).at[2, 3].set(_FLANGE_D)
    return T[:3, 3], T[:3, :3]


def geometric_jacobian(q):
    """6x7 geometric Jacobian [J_v; J_w] at the EE, from the FK chain."""
    Ts = []
    T = jnp.eye(4)
    for i in range(7):
        T = T @ _dh_transform(_DH_A[i], _DH_D[i], _DH_ALPHA[i], q[i])
        Ts.append(T)
    p_ee = (Ts[-1] @ jnp.diag(jnp.ones(4)).at[2, 3].set(_FLANGE_D))[:3, 3]
    cols = []
    for i in range(7):
        z = Ts[i][:3, 2]
        p = Ts[i][:3, 3]
        cols.append(jnp.concatenate([jnp.cross(z, p_ee - p), z]))
    return jnp.stack(cols, axis=1)


def _dls_pinv(J, damping=1e-2):
    """Damped least-squares pseudo-inverse (the numerically-safe stand-in
    for np.linalg.pinv(J) in franka_env.py:222)."""
    JJt = J @ J.T + damping**2 * jnp.eye(6)
    return J.T @ jnp.linalg.solve(JJt, jnp.eye(6))


def ik_step(q, target_p, target_R, gain=0.8, damping=5e-2):
    """One DLS IK iteration toward (target_p, target_R)."""
    p, R = fk(q)
    err_p = target_p - p
    # orientation error as rotation vector of R_err = target * R^T
    R_err = target_R @ R.T
    w = 0.5 * jnp.array([
        R_err[2, 1] - R_err[1, 2],
        R_err[0, 2] - R_err[2, 0],
        R_err[1, 0] - R_err[0, 1],
    ])
    twist = jnp.concatenate([err_p, w])
    dq = _dls_pinv(geometric_jacobian(q), damping) @ twist
    return jnp.clip(q + gain * dq, Q_MIN, Q_MAX)


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_ik(q0, pose6, iters: int = 50):
    """Fixed-trip DLS IK (parity: calculateInverseKinematics
    maxNumIterations=50, franka_env.py:238)."""
    target_p = pose6[:3]
    target_R = euler_angles_to_matrix(pose6[3:], "XYZ")

    def body(q, _):
        return ik_step(q, target_p, target_R), ()

    q, _ = jax.lax.scan(body, q0, None, length=iters)
    return q


class ArmState(NamedTuple):
    q: jax.Array  # (7,) joint positions
    qdot: jax.Array  # (7,) joint velocities (last commanded)
    pose: jax.Array  # (6,) cached EE pose (tray coords, xyzrpw)
    vel: jax.Array  # (6,) cached EE twist
    brightness: jax.Array  # ()
    count: jax.Array  # () int32 velocity-command counter (drift correction)
    scene: TrayScene


@dataclasses.dataclass(frozen=True)
class ArmEnv:
    """Same surface as SyntheticEnv, backed by joint-space kinematics."""

    tray_lim: tuple  # ((lo, hi) x 6) — workspace box for clipping/contact
    dt: float = 0.04
    img_hw: tuple = (180, 180)
    max_force: float = 30.0
    substeps: int = 4  # iters_per_step (franka_env.py:208)
    drift_every: int = 20  # updatePybullet :305
    fix_z: bool = False  # drift correction pins z (bridge full_control flags)
    level_ee: bool = True  # drift correction re-levels roll/pitch
    # -- dynamic (penalty) contact: force comes from simulated mechanics --
    # Parity target: the PyBullet plant's rigid-body collision force read
    # from the EE joint reaction sensor (franka_env.py:268-284). Objects
    # are vertical cylinders; penetration resolves along the minimal exit
    # direction (side normal or top), force = stiffness x depth, and a
    # pushed object displaces by obj_mobility x penetration per step.
    # obj_mobility=0.0 matches the reference's useFixedBase=True objects
    # (franka_env.py:158-166: fixed-base URDFs — collision force without
    # displacement); >0 adds the movable-object case.
    dynamic_contact: bool = False
    contact_stiffness: float = 500.0
    obj_mobility: float = 0.0
    # Soft objects (reference: the loadSoftBody swap, franka_env.py:160-162,
    # Neo-Hookean deformables in place of fixed-base URDFs). Behavioral
    # analog here: compliant contact — the object yields, so (a) force per
    # penetration is lower (soft_compliance x stiffness) and saturates with
    # depth as the body deforms around the EE, and (b) deep contact never
    # hard-blocks motion (no mechanical wedge: the EE presses through soft
    # material with resistance instead of stopping). The table stays rigid.
    soft_objects: bool = False
    soft_compliance: float = 0.3  # fraction of rigid stiffness at depth->0
    soft_sat_depth: float = 0.05  # m; depth at which force halves vs linear

    def _lims(self):
        return jnp.asarray(self.tray_lim, jnp.float32)

    def _ee_pose(self, q):
        p, R = fk(q)
        rpw = matrix_to_euler_angles(R, "XYZ")
        # euler extraction returns angles in (-pi, pi]; re-wrap each to the
        # 2*pi-equivalent nearest the tray-lim midpoint so e.g. roll ~ -pi
        # lands in the reference's (2.39, 3.89) roll box (same convention
        # the free-flying env keeps by integrating within the box)
        ang_lims = self._lims()[3:]
        mid = 0.5 * (ang_lims[:, 0] + ang_lims[:, 1])
        rpw = rpw + 2 * jnp.pi * jnp.round((mid - rpw) / (2 * jnp.pi))
        return jnp.concatenate([p, rpw])

    def init(self, pose0, scene: TrayScene | None = None, brightness=1.0,
             ik_iters: int = 100) -> ArmState:
        pose0 = jnp.asarray(pose0, jnp.float32)
        q = solve_ik(Q_HOME, pose0, iters=ik_iters)
        return ArmState(
            q=q, qdot=jnp.zeros(7),
            pose=self._ee_pose(q).astype(jnp.float32),
            vel=jnp.zeros(6, jnp.float32),
            brightness=jnp.asarray(brightness, jnp.float32),
            count=jnp.zeros((), jnp.int32),
            scene=scene if scene is not None else TrayScene.default(),
        )

    def reset_joints(self, s: ArmState) -> ArmState:
        """Joint reset to home (resetJointsCallback / reset_joints topic)."""
        return s._replace(q=Q_HOME, qdot=jnp.zeros(7),
                          pose=self._ee_pose(Q_HOME).astype(jnp.float32),
                          vel=jnp.zeros(6, jnp.float32))

    def _pose_rate(self, pose, prev):
        """Finite-difference twist; angle deltas wrapped to (-pi, pi] so an
        euler-representation jump at the wrist singularity does not read as
        an enormous angular velocity."""
        d = pose - prev
        dang = jnp.mod(d[3:] + jnp.pi, 2 * jnp.pi) - jnp.pi
        return jnp.concatenate([d[:3], dang]) / self.dt

    def _contact_force(self, pose, scene: TrayScene):
        """Object contact + table contact (the PyBullet scene has a solid
        table under the workspace; the free-flying env clips z instead)."""
        d2 = jnp.sum((pose[None, :2] - scene.obj_xy) ** 2, axis=1)
        over = jnp.exp(-0.5 * d2 / scene.obj_radius**2)
        top = jnp.max(over * scene.obj_height)
        table_z = self._lims()[2, 0] - 0.01
        pen = jnp.maximum(top - pose[2], 0.0) + jnp.maximum(table_z - pose[2], 0.0)
        return jnp.clip(pen * 500.0, 0.0, self.max_force)

    def _contact_wrench(self, pose, scene: TrayScene):
        """Penalty contact force as a 3-vector from simulated mechanics
        (dynamic_contact mode; parity: the EE joint reaction force of the
        PyBullet plant, franka_env.py:268-284).

        Each object is a vertical cylinder (center obj_xy, radius, height).
        An EE point inside it resolves along the MINIMAL exit direction:
        shallower side penetration -> outward radial force, shallower top
        penetration -> +z force; magnitude = contact_stiffness x depth. The
        table below the workspace pushes +z. Returns (force3 on the EE,
        push_xy (K, 2) object displacements for obj_mobility > 0)."""
        k = self.contact_stiffness
        dxy = pose[None, :2] - scene.obj_xy  # (K, 2)
        dist = jnp.linalg.norm(dxy, axis=1)
        n_xy = dxy / jnp.maximum(dist, 1e-6)[:, None]
        pen_side = scene.obj_radius - dist  # >0 when radially inside
        pen_top = scene.obj_height - pose[2]  # >0 when below the top
        inside = (pen_side > 0) & (pen_top > 0)
        side_exit = pen_side < pen_top  # minimal-translation direction
        f_side = jnp.where((inside & side_exit)[:, None],
                           self._pen_force(pen_side)[:, None] * n_xy,
                           0.0)  # (K, 2)
        f_top = jnp.where(inside & ~side_exit, self._pen_force(pen_top),
                          0.0)  # (K,)
        force = jnp.concatenate([jnp.sum(f_side, 0),
                                 jnp.sum(f_top, keepdims=True)])
        table_z = self._lims()[2, 0] - 0.01
        force = force.at[2].add(k * jnp.maximum(table_z - pose[2], 0.0))
        # Newton's third law: a side-pushed object displaces away from the
        # EE by mobility x penetration (0 = fixed base, reference parity)
        push_xy = jnp.where((inside & side_exit)[:, None],
                            -self.obj_mobility * pen_side[:, None] * n_xy,
                            0.0)
        norm = jnp.linalg.norm(force)
        scale = jnp.where(norm > self.max_force, self.max_force
                          / jnp.maximum(norm, 1e-9), 1.0)
        return force * scale, push_xy

    def _pen_force(self, depth):
        """Object contact-force magnitude for a penetration depth.

        Rigid (default): stiffness x depth, the penalty analog of the
        fixed-base URDF collision (franka_env.py:158-166). Soft: the body
        yields — initial stiffness soft_compliance x k, saturating as
        k_soft * d / (1 + d / soft_sat_depth) for large-deformation
        compliance (the loadSoftBody variant, franka_env.py:160-162)."""
        if not self.soft_objects:
            return self.contact_stiffness * depth
        k_soft = self.contact_stiffness * self.soft_compliance
        return k_soft * depth / (1.0 + depth / self.soft_sat_depth)

    def _apply_contact(self, s: "ArmState", q) -> TrayScene:
        """Displace side-pushed objects (dynamic_contact only)."""
        if not self.dynamic_contact or self.obj_mobility == 0.0:
            return s.scene
        pose = self._ee_pose(q)
        _, push_xy = self._contact_wrench(pose, s.scene)
        return s.scene._replace(obj_xy=s.scene.obj_xy + push_xy)

    def step_vel(self, s: ArmState, cmd_vel, cmd_brightness=None) -> ArmState:
        """EE-twist command -> pinv joint velocities, N substeps
        (franka_env.py:207-237) + force-aware z guard + periodic drift
        correction (franka_module :305-318)."""
        cmd = jnp.asarray(cmd_vel, jnp.float32)
        if self.dynamic_contact:
            # deep contact obstructs motion INTO the contact normal (the
            # rigid plant physically stops there, producing the wedge the
            # escape path exists for: vel_move_force_norm fires along the
            # +force direction, which is exactly the free direction here).
            # Soft objects never block: the deformable yields under the EE
            # (loadSoftBody variant), so contact force rises but motion
            # proceeds.
            f3, _ = self._contact_wrench(s.pose, s.scene)
            fn = jnp.linalg.norm(f3)
            blocked = (fn > 0.75 * self.max_force) & (not self.soft_objects)
            n = f3 / jnp.maximum(fn, 1e-9)  # force pushes the EE OUT
            into = jnp.maximum(jnp.dot(cmd[:3], -n), 0.0)
            cmd = cmd.at[:3].set(
                jnp.where(blocked, cmd[:3] + into * n, cmd[:3]))
        else:
            force = self._contact_force(s.pose, s.scene)
            blocked = force > 0.75 * self.max_force
            cmd = cmd.at[2].set(jnp.where(blocked & (cmd[2] < 0), 0.0, cmd[2]))

        dt_sub = self.dt / self.substeps
        def sub(q, _):
            J = geometric_jacobian(q)
            qd = jnp.clip(_dls_pinv(J) @ cmd, -QD_MAX, QD_MAX)
            return jnp.clip(q + qd * dt_sub, Q_MIN, Q_MAX), qd
        q, qds = jax.lax.scan(sub, s.q, None, length=self.substeps)
        qdot = qds[-1]

        count = s.count + 1
        if self.drift_every > 0:
            # IK correction toward the current pose with z pinned / rp
            # leveled, applied every drift_every commands
            pose_now = self._ee_pose(q)
            fix = pose_now
            if self.fix_z:
                fix = fix.at[2].set(s.pose[2])
            if self.level_ee:
                fix = fix.at[3].set(jnp.pi).at[4].set(0.0)
            q_fix = solve_ik(q, fix, iters=5)
            q = jnp.where(count % self.drift_every == 0, q_fix, q)

        pose = self._ee_pose(q)
        vel = self._pose_rate(pose, s.pose)
        b = s.brightness if cmd_brightness is None else jnp.asarray(cmd_brightness)
        return s._replace(q=q, qdot=qdot, pose=pose.astype(jnp.float32),
                          vel=vel.astype(jnp.float32), brightness=b,
                          count=count, scene=self._apply_contact(s, q))

    def step_pose(self, s: ArmState, cmd_pose, cmd_brightness=None) -> ArmState:
        """IK position control (franka_env.py:238-244): DLS IK toward the
        clipped target, then a rate-limited joint servo."""
        lims = self._lims()
        target = jnp.clip(jnp.asarray(cmd_pose, jnp.float32),
                          lims[:, 0], lims[:, 1])
        q_goal = solve_ik(s.q, target, iters=20)
        dq = jnp.clip(q_goal - s.q, -QD_MAX * self.dt, QD_MAX * self.dt)
        q = jnp.clip(s.q + dq, Q_MIN, Q_MAX)
        pose = self._ee_pose(q)
        vel = self._pose_rate(pose, s.pose)
        b = s.brightness if cmd_brightness is None else jnp.asarray(cmd_brightness)
        return s._replace(q=q, qdot=dq / self.dt, pose=pose.astype(jnp.float32),
                          vel=vel.astype(jnp.float32), brightness=b,
                          scene=self._apply_contact(s, q))

    def observe(self, s: ArmState):
        img = render_camera(s.scene, s.pose, s.brightness, self.img_hw)
        if self.dynamic_contact:
            # full contact force vector: the escape path steers along the
            # force DIRECTION (vel_move_force_norm, sensor_utils.py:460-476);
            # learning consumers reduce it to ||F|| (absorb_step)
            force, _ = self._contact_wrench(s.pose, s.scene)
        else:
            force = self._contact_force(s.pose, s.scene)[None]
        return s.pose, s.vel, force, img
