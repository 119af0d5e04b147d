"""Entropy-slice visualization of the learned uncertainty field.

Parity target: ``get_dists`` (dist_modules/fingerprint_builder.py:335-417):
for each z-range variant (posz: z limited to [0, hi]; negz: [lo, 0]; allz:
full range), draw 1000 uniform samples over the plot plane plus the 4 lim
corners, cross them with a 10-point grid over every remaining state dim,
seed the model's conditional distribution from ``num_seeds`` random replay
entries, average the per-seed uncertainty pdfs, renormalize, and
marginalize over the non-plot dims — one "entropy slice" per variant.

TPU-first: the reference loops seeds on the host, each with a chunked
multi-thread decode. Here the whole (seed x sample) sweep is ONE jitted
program — a vmap over seeds of a single batched decode — and only the
(num_plot,) marginal ever leaves the device.
"""

from __future__ import annotations

import itertools
import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..models import CVAE
from ..models.cvae import init_model_state, update_dist
from ..ops.kernels import renormalize


def _slice_lims(lims, lim_scale: float, pin):
    """Scaled sampling lims with an optional pinned bound.

    ``pin = (dim, side)`` sets lims[dim, side] = 0 — side 0 clamps the lower
    bound (z >= 0 half-space), side 1 the upper (z <= 0), matching
    ``fp.lims[z_idx, idx] = 0`` (fingerprint_builder.py:356-358).
    """
    lims = np.asarray(lims, np.float32).copy()
    span = (lims[:, 1] - lims[:, 0]) * (lim_scale - 1.0) / 2.0
    lims[:, 0] -= span
    lims[:, 1] += span
    if pin is not None:
        dim, side = pin
        lims[dim, side] = 0.0
    return lims


def entropy_slice(
    model: CVAE,
    params,
    buf,
    key,
    lims,
    *,
    pin=None,
    plot_idx=(0, 1),
    num_samples: int = 1000,
    num_seeds: int = 10,
    grid_pts: int = 10,
    lim_scale: float = 1.15,
    use_z_ensemble: bool = False,
):
    """One marginal uncertainty field over the ``plot_idx`` plane.

    Returns ``(plot_samples (P, 2), marginal (P,))`` as numpy arrays, where
    P = num_samples + 4 corners and the marginal is the seed-averaged,
    renormalized pdf averaged over the grid of non-plot dims.
    """
    d = len(lims)
    lims = _slice_lims(lims, lim_scale, pin)
    plot_idx = list(plot_idx)
    other_idx = [i for i in range(d) if i not in plot_idx]

    k_samp, k_seed = jax.random.split(jax.random.PRNGKey(0) if key is None else key)
    plane = jax.random.uniform(
        k_samp, (num_samples, 2),
        minval=jnp.asarray(lims[plot_idx, 0]),
        maxval=jnp.asarray(lims[plot_idx, 1]),
    )
    corners = jnp.asarray(
        list(itertools.product(*lims[plot_idx])), jnp.float32
    )
    plane = jnp.concatenate([plane, corners])  # (P, 2)
    P = plane.shape[0]

    if other_idx:
        axes = [np.linspace(lo, hi, grid_pts, dtype=np.float32)
                for lo, hi in lims[other_idx]]
        others = jnp.asarray(list(itertools.product(*axes)))  # (G, len(other))
    else:
        others = jnp.zeros((1, 0), jnp.float32)
    G = others.shape[0]

    # (P, G, d) full-state grid: plot dims broadcast along G, others along P
    full = jnp.zeros((P, G, d), jnp.float32)
    full = full.at[:, :, jnp.asarray(plot_idx)].set(plane[:, None, :])
    if other_idx:
        full = full.at[:, :, jnp.asarray(other_idx)].set(others[None, :, :])
    samples = full.reshape(P * G, d)

    idx = buf.sample_indices(k_seed, num_seeds, weighted=False)
    xs, ys, fs = buf.x[idx], buf.y[idx], buf.force[idx]

    @jax.jit
    def sweep(params, xs, ys, fs, samples):
        def per_seed(x, y, force):
            ms, _ = update_dist(model, params, init_model_state(model), x, y,
                                force=force if model.learn_force else None)
            return model.apply(params, ms, samples, use_z_ensemble,
                               method=CVAE.pdf)

        pdfs = jax.vmap(per_seed)(xs, ys, fs)  # (num_seeds, P*G)
        mean = renormalize(pdfs.mean(0))
        return mean.reshape(P, G).mean(1)

    marginal = sweep(params, xs, ys, fs, samples)
    return np.asarray(plane), np.asarray(marginal)


def entropy_slices(
    model: CVAE,
    params,
    buf,
    key,
    lims,
    states: str,
    **kw,
):
    """The reference's full variant sweep (fingerprint_builder.py:344-352):
    for a 'z' state dim, posz / negz / allz slices; otherwise one slice.

    Returns ``{name: (plot_samples, marginal)}``.
    """
    out = {}
    if "z" in states:
        z_idx = states.rfind("z")
        variants = [("posz", (z_idx, 0)), ("negz", (z_idx, 1)), ("allz", None)]
    else:
        variants = [("all", None)]
    for name, pin in variants:
        out[name] = entropy_slice(model, params, buf, key, lims, pin=pin, **kw)
    return out
