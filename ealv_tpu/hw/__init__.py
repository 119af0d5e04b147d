from .native import NativeControllers, build_native, ControlMode
from .bridge import RobotBridge, SyntheticBridge, NativeBridge
