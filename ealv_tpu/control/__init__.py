from .dynamics import (
    rk4_step,
    SingleIntegrator,
    DoubleIntegrator,
    DoubleIntegratorSpeed,
    DoubleIntegratorRoll,
    make_dynamics,
)
from .barrier import BarrierFunction, NoBarrier, setup_barrier
from .policies import RollPolicy, ZeroPolicy, BarrierPushPolicy, LQRPolicy, make_policy
