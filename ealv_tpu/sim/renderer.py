"""Pure-JAX synthetic tray renderer — the simulator camera.

Role parity: FrankaEnv.cam_img (franka_test/scripts/franka/franka_env.py:
250-266): a wrist camera looking down at a textured tabletop with objects,
whose image depends smoothly on end-effector pose and on a brightness state
(ambient light coupled to the 'b' exploration dim, franka_env.py:96-117).

The reference renders through PyBullet/OpenGL on the host. TPU-first, the
camera IS a jittable function: pinhole rays from the EE pose intersect the
tray plane, and the hit points sample a procedural radiance field (textured
ground + colored objects with height). That keeps the entire
explore->learn loop device-resident (the SURVEY.md §7 stage-3 "tray
renderer") — no host round trip per frame — and makes the scene
differentiable for free.

Conventions: world tray coords (x, y) in meters on the plane, z up. Camera
looks along -z with yaw rotation about z and small roll/pitch tilts.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class TrayScene(NamedTuple):
    """Procedural scene: K blob objects + checker ground.

    obj_xy: (K, 2) object centers (tray coords)
    obj_radius: (K,) blob radii
    obj_height: (K,) object heights (for force/contact and parallax)
    obj_color: (K, 3) RGB
    """

    obj_xy: jax.Array
    obj_radius: jax.Array
    obj_height: jax.Array
    obj_color: jax.Array
    ground_color: jax.Array  # (3,)
    checker_scale: float = 12.0

    @classmethod
    def default(cls):
        """Two-object scene echoing the reference's duck + pineapple tabletop
        (franka_env.py:47-156): one yellow round object, one textured tall one."""
        return cls(
            obj_xy=jnp.array([[0.42, -0.06], [0.53, 0.07]], jnp.float32),
            obj_radius=jnp.array([0.035, 0.03], jnp.float32),
            # heights reach into the EE's z band (tray z in [0.2, 0.5], which
            # already includes the camera/FT offset, test_config.yaml:22,40)
            # so pressing down near the z floor makes contact
            obj_height=jnp.array([0.22, 0.25], jnp.float32),
            obj_color=jnp.array([[0.95, 0.85, 0.1], [0.2, 0.7, 0.3]], jnp.float32),
            ground_color=jnp.array([0.45, 0.35, 0.3], jnp.float32),
        )

    @classmethod
    def make(cls, k: int, seed: int = 0):
        """K-object scene (the reference's multi-object tabletop runs,
        fingerprint_mp:216-240 load several object models per run).
        Centers are placed on a jittered ring inside the tray so every
        pair stays separated; colors/radii/heights are distinct so the
        CVAE can tell the objects apart."""
        import numpy as np

        rng = np.random.default_rng(seed)
        cx, cy, r0 = 0.475, 0.0, 0.065
        ang = 2 * np.pi * (np.arange(k) / k) + rng.uniform(-0.2, 0.2, k)
        xy = np.stack([cx + r0 * np.cos(ang), cy + r0 * np.sin(ang)], 1)
        hues = np.linspace(0.0, 1.0, k, endpoint=False)
        colors = np.stack([
            0.5 + 0.45 * np.cos(2 * np.pi * (hues + s))
            for s in (0.0, 1 / 3, 2 / 3)
        ], 1)
        return cls(
            obj_xy=jnp.asarray(xy, jnp.float32),
            obj_radius=jnp.asarray(0.026 + 0.012 * rng.random(k), jnp.float32),
            obj_height=jnp.asarray(0.21 + 0.05 * rng.random(k), jnp.float32),
            obj_color=jnp.asarray(colors, jnp.float32),
            ground_color=jnp.array([0.45, 0.35, 0.3], jnp.float32),
        )

    def move_objects(self, key, tray_lim_xy):
        """Randomize object placement (parity: FrankaEnv.move_objects
        :173-192)."""
        k = self.obj_xy.shape[0]
        lo = tray_lim_xy[:, 0]
        hi = tray_lim_xy[:, 1]
        new_xy = jax.random.uniform(key, (k, 2), minval=lo, maxval=hi)
        return self._replace(obj_xy=new_xy)


def _radiance(scene: TrayScene, u, v):
    """Color + height of the tray surface at world (u, v). u, v: (...,)."""
    cs = scene.checker_scale
    checker = 0.5 + 0.5 * jnp.sin(u * cs) * jnp.sin(v * cs)
    base = scene.ground_color[None, None, :] * (0.7 + 0.3 * checker[..., None])

    d2 = (u[..., None] - scene.obj_xy[:, 0]) ** 2 + (v[..., None] - scene.obj_xy[:, 1]) ** 2
    w = jnp.exp(-0.5 * d2 / scene.obj_radius[None, None, :] ** 2)  # (..., K)
    height = jnp.max(w * scene.obj_height[None, None, :], axis=-1)
    # soft-max blend of object colors over ground
    obj_rgb = jnp.einsum("...k,kc->...c", w, scene.obj_color)
    w_tot = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 0.0, 1.0)
    color = base * (1.0 - w_tot) + obj_rgb * jnp.minimum(w_tot, 1.0) / jnp.maximum(
        jnp.sum(w, -1, keepdims=True), 1e-6
    ) * w_tot
    return color, height


def render_camera(
    scene: TrayScene,
    pose,  # (x, y, z, roll, pitch, yaw) camera pose in tray coords
    brightness=1.0,
    img_hw=(180, 180),
    fov: float = 1.0,
):
    """(H, W, 3) image in [0, 1] from the wrist camera at ``pose``.

    Pinhole: pixel grid -> ray directions tilted by (roll, pitch), rotated by
    yaw, intersected with the tray plane z=0; brightness scales illumination
    (parity: brightness-coupled ambient light, franka_env.py:96-117,250-266).
    Height field adds cheap parallax + lambertian-ish shading so images vary
    with z and tilt, not just (x, y).
    """
    pose = jnp.asarray(pose, jnp.float32)
    x, y, z = pose[0], pose[1], jnp.maximum(pose[2], 0.02)
    roll, pitch, yaw = pose[3], pose[4], pose[5]

    h_pix, w_pix = img_hw
    iy = jnp.linspace(-jnp.tan(fov / 2), jnp.tan(fov / 2), h_pix)
    ix = jnp.linspace(-jnp.tan(fov / 2), jnp.tan(fov / 2), w_pix)
    py, px = jnp.meshgrid(iy, ix, indexing="ij")  # (H, W)

    # ray direction in camera frame (looking along -z), tilted by roll/pitch
    dx = px + jnp.tan(pitch)
    dy = py + jnp.tan(roll)
    # yaw-rotate the in-plane components
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    du = c * dx - s * dy
    dv = s * dx + c * dy

    # intersect plane z=0: world hit = (x + z*du, y + z*dv)
    u = x + z * du
    v = y + z * dv

    color, height = _radiance(scene, u, v)
    # parallax: tall objects appear larger when camera is low
    scale = jnp.clip(height / z, 0.0, 0.9)
    color = color * (1.0 + 0.8 * scale[..., None])
    # vignette + distance falloff, then brightness
    r2 = px**2 + py**2
    vignette = 1.0 - 0.25 * r2
    illum = brightness * vignette / (1.0 + 0.5 * z)
    return jnp.clip(color * illum[..., None], 0.0, 1.0)
