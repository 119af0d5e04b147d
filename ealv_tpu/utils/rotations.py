"""SO(3) utilities: Euler <-> rotation matrix, hat/unhat, Rodrigues exp.

Covers the behavior of the reference's rotations library
(franka_test/scripts/control_torch/rotations.py: euler_angles_to_matrix :70,
matrix_to_euler_angles :142) and the skew-matrix helpers in
control_torch/dynamics.py:164-222 — re-derived for JAX, not translated.

Convention: scipy EXTRINSIC 'xyz', i.e. ``R = Rz(c) @ Ry(b) @ Rx(a)`` for
angles ``(a, b, c)``. The reference deliberately flips pytorch3d's intrinsic
product to this order (rotations.py:96 "flipped order to match scipy
rotations"; dynamics.py:312 "equivalent to scipy from_euler('xyz', rot)"),
and the SO(3) roll env's trajectories depend on it. The matrix exponential
of a skew-symmetric matrix uses the closed-form Rodrigues formula instead of
a general expm — cheaper and fully differentiable on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# 3x3 chains are tiny; force full f32 so TPU's default bf16 MXU passes don't
# leak ~5e-3 rad of error into the SO(3) dynamics.
_mm = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def _rx(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([o, z, z], -1), jnp.stack([z, c, -s], -1), jnp.stack([z, s, c], -1)], -2
    )


def _ry(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([c, z, s], -1), jnp.stack([z, o, z], -1), jnp.stack([-s, z, c], -1)], -2
    )


def _rz(a):
    c, s = jnp.cos(a), jnp.sin(a)
    o, z = jnp.ones_like(a), jnp.zeros_like(a)
    return jnp.stack(
        [jnp.stack([c, -s, z], -1), jnp.stack([s, c, z], -1), jnp.stack([z, z, o], -1)], -2
    )


_AXES = {"X": _rx, "Y": _ry, "Z": _rz}


def euler_angles_to_matrix(angles, convention: str = "XYZ"):
    """Euler angles (..., 3) -> rotation matrices (..., 3, 3).

    Flipped product ``m2 @ m1 @ m0`` like the reference (rotations.py:96):
    'XYZ' angles (a, b, c) give ``Rz(c) @ Ry(b) @ Rx(a)`` — scipy's
    extrinsic ``from_euler('xyz', ...)``.
    """
    angles = jnp.asarray(angles)
    mats = [_AXES[c](angles[..., i]) for i, c in enumerate(convention)]
    return _mm(_mm(mats[2], mats[1]), mats[0])


def matrix_to_euler_angles(R, convention: str = "XYZ"):
    """Rotation matrices (..., 3, 3) -> Euler angles (..., 3), XYZ only.

    For R = Rz(c) Ry(b) Rx(a):
      R[2,0] = -sin(b)
      a = atan2(R[2,1], R[2,2]),  c = atan2(R[1,0], R[0,0])
    """
    if convention != "XYZ":
        raise NotImplementedError("only 'XYZ' (scipy extrinsic xyz) is used")
    R = jnp.asarray(R)
    b = jnp.arcsin(jnp.clip(-R[..., 2, 0], -1.0, 1.0))
    a = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    c = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def hat(w):
    """(..., 3) -> (..., 3, 3) skew-symmetric matrix."""
    w = jnp.asarray(w)
    z = jnp.zeros_like(w[..., 0])
    return jnp.stack(
        [
            jnp.stack([z, -w[..., 2], w[..., 1]], -1),
            jnp.stack([w[..., 2], z, -w[..., 0]], -1),
            jnp.stack([-w[..., 1], w[..., 0], z], -1),
        ],
        -2,
    )


def unhat(W):
    """(..., 3, 3) skew-symmetric -> (..., 3)."""
    W = jnp.asarray(W)
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], -1)


def so3_exp(w, eps: float = 1e-8):
    """Rodrigues: exp(hat(w)) for rotation vector w (..., 3).

    Closed form replaces the reference's torch.matrix_exp
    (dynamics.py:215) — exact for skew-symmetric input.
    """
    w = jnp.asarray(w)
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    theta = jnp.maximum(theta, eps)
    axis = w / theta
    K = hat(axis)
    t = theta[..., None]
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return I + jnp.sin(t) * K + (1.0 - jnp.cos(t)) * _mm(K, K)


def wrap_angles(rot):
    """Reference angle-wrapping (dynamics.py:219-222): roll in [0, 2pi),
    pitch/yaw in [-pi, pi)."""
    rot = jnp.asarray(rot)
    r0 = rot[..., 0] % (2 * jnp.pi)
    r12 = (rot[..., 1:] + jnp.pi) % (2 * jnp.pi) - jnp.pi
    return jnp.concatenate([r0[..., None], r12], axis=-1)


def euler_rate_jacobian(rot):
    """Body angular velocity -> Euler XYZ rate map B(r, p) with the
    reference's pitch-singularity nudge (dynamics.py:189-211).

    Returns the 3x3 matrix  [[1, s0*t1, c0*t1], [0, c0, -s0], [0, s0/c1, c0/c1]].
    """
    rot = jnp.asarray(rot)
    r = rot[..., 0]
    p = rot[..., 1] + 1e-5  # singularity guard at pitch = pi/2
    s0, c0 = jnp.sin(r), jnp.cos(r)
    t1, c1 = jnp.tan(p), jnp.cos(p)
    o, z = jnp.ones_like(r), jnp.zeros_like(r)
    return jnp.stack(
        [
            jnp.stack([o, s0 * t1, c0 * t1], -1),
            jnp.stack([z, c0, -s0], -1),
            jnp.stack([z, s0 / c1, c0 / c1], -1),
        ],
        -2,
    )
