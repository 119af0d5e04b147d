from .schedules import HyperState, hyperparam_update, entropy_grade_spread
from .trainer import TrainerStatics, train_call
from .agent import Experiment, ExperimentState
from .host_loop import HostLoopRunner
