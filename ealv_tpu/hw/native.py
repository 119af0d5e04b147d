"""ctypes bindings for the native realtime controller library.

The C++ side (native/) provides the hardware-path runtime the reference
implements as franka_hw plugins (SURVEY.md §2.2): slew-limited velocity
ramping, double low-pass pose filtering, PID joint moves, wrench filtering,
and the mode mux. Device (TPU) code never touches this — it sits strictly
host-side between the planner's commands and the 1 kHz robot loop.

Build: ``python -m ealv_tpu.hw.native`` or `build_native()` (cmake+ninja or
plain g++ fallback). No pybind11 in the toolchain -> C ABI + ctypes.
"""

from __future__ import annotations

import ctypes
import enum
import os
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATHS = [
    _NATIVE_DIR / "build" / "libealv_native.so",
    _NATIVE_DIR / "libealv_native.so",
]


class ControlMode(enum.IntEnum):
    VELOCITY = 0
    POSE = 1
    JOINT = 2


def build_native(force: bool = False) -> Path:
    """Compile the native library (cmake if available, g++ fallback)."""
    out = _LIB_PATHS[0]
    if out.exists() and not force:
        return out
    build_dir = _NATIVE_DIR / "build"
    build_dir.mkdir(exist_ok=True)
    try:
        subprocess.run(
            ["cmake", "-S", str(_NATIVE_DIR), "-B", str(build_dir), "-G", "Ninja"],
            check=True, capture_output=True,
        )
        subprocess.run(["cmake", "--build", str(build_dir)], check=True,
                       capture_output=True)
    except (subprocess.CalledProcessError, FileNotFoundError):
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
             "-I", str(_NATIVE_DIR / "include"),
             str(_NATIVE_DIR / "src" / "controllers.cpp"),
             str(_NATIVE_DIR / "src" / "rt_loop.cpp"),
             str(_NATIVE_DIR / "src" / "c_api.cpp"),
             "-o", str(out)],
            check=True,
        )
    return out


def _load():
    for p in _LIB_PATHS:
        if p.exists():
            return ctypes.CDLL(str(p))
    return ctypes.CDLL(str(build_native()))


_d6 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")


class NativeControllers:
    """Python handle on the ControllerMux (the go_vel surface)."""

    def __init__(self, dt: float = 1e-3, cmd_dt: float = 0.1,
                 max_force: float = 30.0):
        self._lib = _load()
        lib = self._lib
        lib.ealv_mux_create.restype = ctypes.c_void_p
        lib.ealv_mux_create.argtypes = [ctypes.c_double] * 3
        for name, argts in [
            ("ealv_mux_destroy", [ctypes.c_void_p]),
            ("ealv_mux_switch_mode", [ctypes.c_void_p, ctypes.c_int]),
            ("ealv_mux_command_twist", [ctypes.c_void_p, _d6, ctypes.c_int]),
            ("ealv_mux_command_pose", [ctypes.c_void_p, _d6]),
            ("ealv_mux_command_joints", [ctypes.c_void_p, _d6]),
            ("ealv_mux_set_wrench", [ctypes.c_void_p, _d6]),
            ("ealv_mux_tick_velocity", [ctypes.c_void_p, _d6]),
            ("ealv_mux_tick_pose", [ctypes.c_void_p, _d6, _d6]),
            ("ealv_mux_tick_joints", [ctypes.c_void_p, _d6, _d6]),
        ]:
            getattr(lib, name).argtypes = argts
        lib.ealv_mux_mode.restype = ctypes.c_int
        lib.ealv_mux_mode.argtypes = [ctypes.c_void_p]
        lib.ealv_mux_command_twist.restype = ctypes.c_int
        self._h = lib.ealv_mux_create(dt, cmd_dt, max_force)

    def __del__(self):
        if getattr(self, "_h", None):
            self._lib.ealv_mux_destroy(self._h)
            self._h = None

    # ---- mode switching (/switch_to_{pose,vel}_controller topics) ----
    def switch_mode(self, mode: ControlMode):
        self._lib.ealv_mux_switch_mode(self._h, int(mode))

    @property
    def mode(self) -> ControlMode:
        return ControlMode(self._lib.ealv_mux_mode(self._h))

    # ---- command surface (/klerg_cmd -> /vel_cmd | /pose_cmd | /joint_cmd) --
    def command_twist(self, twist, rt_ok: bool = True) -> bool:
        t = np.ascontiguousarray(twist, np.float64)
        return bool(self._lib.ealv_mux_command_twist(self._h, t, int(rt_ok)))

    def command_pose(self, pose_4x4):
        p = np.ascontiguousarray(pose_4x4, np.float64).reshape(16)
        self._lib.ealv_mux_command_pose(self._h, p)

    def command_joints(self, joints):
        j = np.ascontiguousarray(joints, np.float64)
        self._lib.ealv_mux_command_joints(self._h, j)

    def set_wrench(self, wrench):
        w = np.ascontiguousarray(wrench, np.float64)
        self._lib.ealv_mux_set_wrench(self._h, w)

    # ---- 1 kHz tick outputs ----
    def tick_velocity(self) -> np.ndarray:
        out = np.zeros(6)
        self._lib.ealv_mux_tick_velocity(self._h, out)
        return out

    def tick_pose(self, current_4x4) -> np.ndarray:
        c = np.ascontiguousarray(current_4x4, np.float64).reshape(16)
        out = np.zeros(16)
        self._lib.ealv_mux_tick_pose(self._h, c, out)
        return out.reshape(4, 4)

    def tick_joints(self, current) -> np.ndarray:
        c = np.ascontiguousarray(current, np.float64)
        out = np.zeros(7)
        self._lib.ealv_mux_tick_joints(self._h, c, out)
        return out


if __name__ == "__main__":
    path = build_native(force=True)
    print(f"built {path}")
