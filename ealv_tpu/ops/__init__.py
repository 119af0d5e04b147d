from .kernels import (
    psi_matrix,
    traj_footprint,
    traj_spread,
    kldiv_grad,
    renormalize,
    cost_norm,
    pairwise_scaled_sqdist,
)
