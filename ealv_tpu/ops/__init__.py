from .kernels import (
    psi_matrix,
    traj_footprint,
    traj_spread,
    kldiv_grad,
    kldiv_grad_batch,
    renormalize,
    cost_norm,
    pairwise_scaled_sqdist,
)
