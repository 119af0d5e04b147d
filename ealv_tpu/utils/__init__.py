from .states import (
    ws_conversion,
    find_non_vel_locs,
    state_indices,
    is_vel_state,
    expand_states_double_integrator,
)
from . import rotations
