"""Ergodic-control kernels, TPU-first.

Behavioral parity targets (semantics, not implementation) are the reference's
franka_test/scripts/control_torch/klerg_utils.py:
  psi_fn :7, traj_footprint_vec :17, traj_spread_vec :24,
  dpsi_dx_fn :12, kldiv_grad_vec :31, cost_norm :38, renormalize :45.

TPU design: the (N samples) x (T trajectory points) Gaussian-footprint
matrix is the hot op (N=2000, T=3000 every control step). Instead of
materializing the (N, T, d) broadcast difference like torch does, we expand
the scaled squared distance

    sum_d (t_d - s_d)^2 / std_d  =  |t|^2_w + |s|^2_w - 2 <t, s>_w

so the cross term is a single (N, d) @ (d, T) matmul on the MXU and the rest
fuses into its epilogue. Validity masking (ring buffers with fixed capacity)
is handled by a per-row trajectory mask, so callers never need dynamic
shapes. A fused Pallas kernel for very large N*T lives in
``ealv_tpu.ops.pallas_kernels``; this module is the canonical XLA version and
the numerical ground truth for its tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_scaled_sqdist(a, b, inv_scale):
    """sum_d (a_i,d - b_j,d)^2 * inv_scale_d  as an MXU-friendly matmul.

    a: (N, d), b: (T, d), inv_scale: (d,) -> (N, T) float32.

    Inputs are whitened (x * sqrt(inv_scale)) so the expansion
    |a|^2 + |b|^2 - 2<a,b> carries no extra scale, and the cross term runs at
    HIGHEST matmul precision: the exponent -0.5*sq feeds exp(), where bf16
    MXU passes would visibly distort the footprint (kernel std ~0.05 makes
    sq values O(10^3) near the tails).
    """
    w = jnp.sqrt(inv_scale)
    aw = a * w  # (N, d)
    bw = b * w  # (T, d)
    a2 = jnp.sum(aw * aw, axis=-1)  # (N,)
    b2 = jnp.sum(bw * bw, axis=-1)  # (T,)
    cross = jnp.dot(
        aw, bw.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST
    )
    return a2[:, None] + b2[None, :] - 2.0 * cross


def psi_matrix(samples, traj, std, traj_mask=None):
    """Gaussian footprint matrix psi[n, t] = exp(-0.5 * ||s_n - x_t||^2_std).

    Parity: psi_fn (klerg_utils.py:7-10) with traj/sample broadcasting as used
    by traj_footprint_vec. ``traj_mask`` (T,) zeroes invalid ring-buffer rows.
    """
    inv = 1.0 / jnp.abs(std)
    sq = pairwise_scaled_sqdist(samples, traj, inv)
    psi = jnp.exp(-0.5 * jnp.maximum(sq, 0.0))
    if traj_mask is not None:
        psi = psi * traj_mask[None, :]
    return psi


# Minimum N*T where the fused Pallas kernel beats XLA's dot+exp+reduce
# (measured on v5e at 2000x3000: 0.153 ms vs 0.210 ms — the XLA form
# materializes the (N, T) f32 intermediate in HBM, the Pallas kernel tiles
# it through VMEM; below this size the intermediate fits cache-like reuse
# and kernel launch overhead dominates).
_PALLAS_MIN_ELEMS = 512 * 512


def _use_pallas(samples, traj_explr) -> bool:
    return (
        jax.default_backend() == "tpu"
        and samples.shape[0] * traj_explr.shape[0] >= _PALLAS_MIN_ELEMS
        and samples.dtype == jnp.float32
    )


def _pallas_footprint_spread(samples, traj_explr, std, traj_mask):
    from .pallas_kernels import footprint_and_spread

    mask = (jnp.ones(traj_explr.shape[0], jnp.float32)
            if traj_mask is None else traj_mask.astype(jnp.float32))
    return footprint_and_spread(samples, traj_explr, std, mask)


def traj_footprint(traj, samples, explr_idx, std, nu=1.0, traj_mask=None):
    """Time-summed trajectory footprint q(s) = sum_t psi(s, x_t) / nu.

    Parity: traj_footprint_vec (klerg_utils.py:17-22). ``explr_idx`` selects
    the exploration coordinates out of the full state rows. Large (N, T)
    problems dispatch to the fused Pallas kernel on TPU.
    """
    traj_explr = traj[:, explr_idx]
    if _use_pallas(samples, traj_explr):
        fsum, _ = _pallas_footprint_spread(samples, traj_explr, std, traj_mask)
        return fsum / nu
    psi = psi_matrix(samples, traj_explr, std, traj_mask)
    return jnp.sum(psi, axis=1) / nu


def traj_spread(traj, samples, explr_idx, std, nu=1.0, traj_mask=None):
    """Max-over-time footprint (coverage measure).

    Parity: traj_spread_vec (klerg_utils.py:24-29). Masked rows contribute 0,
    matching "never visited".
    """
    traj_explr = traj[:, explr_idx]
    if _use_pallas(samples, traj_explr):
        _, fmax = _pallas_footprint_spread(samples, traj_explr, std, traj_mask)
        return fmax / nu
    psi = psi_matrix(samples, traj_explr, std, traj_mask)
    return jnp.max(psi, axis=1) / nu


def kldiv_grad(x, samples, explr_idx, std, importance_ratio, nu=1.0):
    """Importance-weighted gradient of the state footprint w.r.t. one state.

    Parity: dpsi_dx_fn + kldiv_grad_vec (klerg_utils.py:12-36):
      grad_d = sum_n w_n * -(x_d - s_n,d)/|std_d| * psi(x, s_n)
    scattered into the full state vector at ``explr_idx``.
    """
    x_e = x[explr_idx]  # (d,)
    std_a = jnp.abs(std)
    diff = -(x_e[None, :] - samples) / std_a  # (n, d)
    sq = jnp.sum(jnp.square(x_e[None, :] - samples) / std_a, axis=-1)
    psi = jnp.exp(-0.5 * sq) / nu  # (n,)
    g = jnp.sum(diff * (psi * importance_ratio)[:, None], axis=0)  # (d,)
    return jnp.zeros_like(x).at[explr_idx].set(g)


def kldiv_grad_batch(xs, samples, explr_idx, std, importance_ratio, nu=1.0):
    """kldiv_grad for a whole trajectory at once: (T, n_states) -> (T, n).

    The costate recursion needs dgdx at every horizon step; none of them
    depend on rho, so they batch into one (T, N) kernel instead of T
    sequential calls (the reference recomputes per step inside its backward
    loop, klerg.py:443)."""
    xs_e = xs[:, explr_idx]  # (T, d)
    std_a = jnp.abs(std)
    diff = -(xs_e[:, None, :] - samples[None, :, :]) / std_a  # (T, N, d)
    psi = psi_matrix(xs_e, samples, std)  # (T, N)
    w = psi * importance_ratio[None, :] / nu
    g = jnp.einsum("tnd,tn->td", diff, w)
    return jnp.zeros((xs.shape[0], xs.shape[1]), xs.dtype).at[:, explr_idx].set(g)


def cost_norm(dist):
    """Nan-safe sum-normalization (klerg_utils.py:38-42), functional."""
    dist = jnp.where(jnp.isnan(dist), 1e-6, dist)
    return dist / jnp.sum(dist)


def renormalize(dist, axis=None, min_val: float = 1e-6):
    """Log-space max-shift renormalization (klerg_utils.py:45-58):
    normalize -> clamp -> log -> subtract max -> exp. Output max is 1."""
    dist = dist / jnp.sum(dist, axis=axis, keepdims=axis is not None)
    dist = jnp.clip(dist, min_val, None)
    logd = jnp.log(dist)
    logd = logd - jnp.max(logd, axis=axis, keepdims=axis is not None)
    return jnp.exp(logd)
