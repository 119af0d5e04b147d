"""Fused Pallas TPU kernel for the ergodic footprint/spread reduction.

The hot op of the KL-ergodic planner is the (N samples) x (T trajectory
points) Gaussian kernel matrix (reference: klerg.py:496 with N=2000, T=3000
every control step, plus one per planner inner iteration). XLA computes it
as dot -> HBM -> fused(exp, reduce), materializing an (N, T) f32 intermediate
(~24 MB) per call. This kernel tiles the matrix through VMEM and fuses
square-distance, exp, masking, and BOTH reductions (sum -> footprint,
max -> spread), so only O(N) bytes ever reach HBM.

Inputs are pre-whitened outside the kernel (x / sqrt(std)), removing the
per-dim scale from the inner loop entirely.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TN = 512  # samples per tile
_TT = 1024  # trajectory points per tile


def _footprint_kernel(s_ref, t_ref, m_ref, sum_ref, max_ref, d: int):
    j = pl.program_id(1)

    # scaled squared distance via per-dim broadcast (d is small and static)
    s = s_ref[:]  # (TN, d)
    t = t_ref[:]  # (d, TT)
    sq = jnp.zeros((s.shape[0], t.shape[1]), dtype=jnp.float32)
    for k in range(d):
        diff = s[:, k][:, None] - t[k][None, :]
        sq = sq + diff * diff
    psi = jnp.exp(-0.5 * sq) * m_ref[:]  # (TN, TT), masked

    part_sum = jnp.sum(psi, axis=1, keepdims=True)  # (TN, 1)
    part_max = jnp.max(psi, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _():
        sum_ref[:] = part_sum
        max_ref[:] = part_max

    @pl.when(j > 0)
    def _():
        sum_ref[:] = sum_ref[:] + part_sum
        max_ref[:] = jnp.maximum(max_ref[:], part_max)


@functools.partial(jax.jit, static_argnames=("interpret",))
def footprint_and_spread(samples, traj, std, traj_mask, interpret: bool = False):
    """Fused (sum_t psi, max_t psi) over the trajectory.

    samples: (N, d), traj: (T, d), std: (d,), traj_mask: (T,) in {0, 1}.
    Returns (footprint (N,), spread (N,)) in float32. Matches
    ops.kernels.traj_footprint / traj_spread with nu=1 and explr_idx=all.
    """
    n, d = samples.shape
    t = traj.shape[0]
    w = jax.lax.rsqrt(jnp.abs(std.astype(jnp.float32)))
    sw = samples.astype(jnp.float32) * w
    tw = (traj.astype(jnp.float32) * w).T  # (d, T)

    n_pad = -n % _TN
    t_pad = -t % _TT
    sw = jnp.pad(sw, ((0, n_pad), (0, 0)))
    tw = jnp.pad(tw, ((0, 0), (0, t_pad)))
    mask = jnp.pad(traj_mask.astype(jnp.float32), (0, t_pad))[None, :]  # (1, T')

    grid = ((n + n_pad) // _TN, (t + t_pad) // _TT)
    out_shape = jax.ShapeDtypeStruct(((n + n_pad), 1), jnp.float32)
    fsum, fmax = pl.pallas_call(
        functools.partial(_footprint_kernel, d=d),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TN, d), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, _TT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((_TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(out_shape, out_shape),
        interpret=interpret,
    )(sw, tw, mask)
    return fsum[:n, 0], fmax[:n, 0]
