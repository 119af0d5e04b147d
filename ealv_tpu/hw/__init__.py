from .native import NativeControllers, build_native, ControlMode
