"""State-string machinery and workspace conversion.

The reference indexes robot state by a character string over 'xyzrpwb'
(lower-case = position-like states, upper-case = velocities); see
franka_test/scripts/franka/franka_utils.py:16-47 and
dist_modules/sensor_utils.py:165-193 for the semantics reproduced here.
All functions are pure and jit-compatible (string parsing happens at trace
time; only the affine map touches arrays).
"""

from __future__ import annotations

import jax.numpy as jnp

# canonical ordering of raw pose states: x, y, z, roll, pitch, yaw, brightness
RAW_STATES = "xyzrpwb"


def ws_conversion(pt, in_lim, out_lim):
    """Affine map between workspace boxes (e.g. metric "tray" coords and
    normalized [-1, 1] "robot" coords).

    Parity: franka_utils.ws_conversion (franka_utils.py:16-30). Accepts a
    single point ``(d,)`` or a batch ``(N, d)``; extra trailing dims of the
    point beyond ``len(in_lim)`` are dropped, like the reference.
    """
    in_lim = jnp.asarray(in_lim)
    out_lim = jnp.asarray(out_lim)
    if in_lim.ndim == 1:
        in_lim = in_lim[None, :]
    if out_lim.ndim == 1:
        out_lim = out_lim[None, :]
    ilim = in_lim[:, 1] - in_lim[:, 0]
    olim = out_lim[:, 1] - out_lim[:, 0]
    n = ilim.shape[0]
    pt = jnp.asarray(pt)
    pts = pt[..., :n]
    return (pts - in_lim[:, 0]) / ilim * olim + out_lim[:, 0]


def is_vel_state(ch: str) -> bool:
    """Upper-case state characters denote velocities."""
    return ch == ch.upper() and ch != ch.lower()


def find_non_vel_locs(states: str):
    """Split a state string into position-like and velocity-like indices.

    Parity: franka_utils.find_non_vel_locs (franka_utils.py:42-47).
    Returns (non_vel_locs, vel_locs, non_vel_states).
    """
    non_vel_locs = [i for i, s in enumerate(states) if s == s.lower()]
    vel_locs = [i for i, s in enumerate(states) if s == s.upper()]
    non_vel_states = "".join(states[i] for i in non_vel_locs)
    return non_vel_locs, vel_locs, non_vel_states


def state_indices(states: str, query: str):
    """Index of each character of ``query`` inside ``states`` (rfind parity)."""
    return [states.rfind(s) for s in query]


def expand_states_double_integrator(states: str) -> str:
    """Double-integrator state string: positions then matching velocities.

    Parity: control_torch/dynamics.py:88 (`states.lower()+states.upper()`).
    """
    return states.lower() + states.upper()
