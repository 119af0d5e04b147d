"""Bayesian belief grids for object re-localization.

Parity target: FingerprintDist (dist_modules/fingerprint_module.py:426-631):
a 50^d grid over the exploration box, Gaussian measurement footprints
(meas_footprint_vec :417-424), tanh measurement squashing (process_meas
:470-478), and a precision-weighted Gaussian fusion update (update_prior
:539-589); pdf via grid lookup (:591-606); angle marginalization
(process_grid_dist :630-701).

TPU-first: the grid, pending-measurement ring, prior and prior-variance are
one pytree; update_prior is a pure jitted function; off-grid pdf queries use
multilinear interpolation on the regular grid instead of a scipy
RBFInterpolator (the reference itself prefers the use_grid path).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from ..ops import renormalize


def _rescale(x, old, new):
    return (x - old[0]) / (old[1] - old[0]) * (new[1] - new[0]) + new[0]


@struct.dataclass
class FingerprintBelief:
    grid: jax.Array  # (G, d) flattened mesh
    lims: jax.Array  # (d, 2) expanded limits
    prior: jax.Array  # (G,)
    prior_var: jax.Array  # (G,)
    meas_loc: jax.Array  # (cap, d) pending measurement ring
    meas_val: jax.Array  # (cap,)
    meas_n: jax.Array  # () pending count
    count: jax.Array  # () total fused measurements
    # static metadata (not traced)
    num_samples: tuple = struct.field(pytree_node=False)
    scale: float = struct.field(pytree_node=False)
    thresh: float = struct.field(pytree_node=False)
    clip: float = struct.field(pytree_node=False)
    invert: bool = struct.field(pytree_node=False, default=False)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, explr_states: str, lims, num_samples: int = 50,
               meas_capacity: int = 64, scale=None, thresh=1.0, clip=2.0,
               invert: bool = False):
        """Grid construction parity (build_grid :507-527): yaw limits are
        widened 1.33x, everything 1.15x (explr_robot_lim_scale), grid is
        num_samples^d, default kernel scale = 2.5 * max mesh spacing."""
        lims = np.asarray(lims, np.float64).copy()
        if "w" in explr_states:
            lims[explr_states.rfind("w")] *= 1.33
        lims = lims * 1.15
        d = lims.shape[0]
        # Capacity guard (documented limit): update_prior materializes a
        # (G, meas_capacity, d) footprint, so memory scales as
        # num_samples^d * meas_capacity. d<=3 at 50 samples/dim is ~32M
        # elements; d=4 at 50/dim is 1.6e9 and would OOM a chip silently.
        # The reference never runs a belief grid above d=3 either — it
        # marginalizes angle dims (process_grid_dist :630-701, and our
        # marginalize_angles below) to stay at 50^2/50^3. Fail loudly with
        # the available knobs instead of letting XLA OOM.
        cells = num_samples ** d
        budget = 96 * 1024 * 1024  # elements in the (G, cap) intermediates
        if cells * meas_capacity > budget:
            fit = int((budget / meas_capacity) ** (1.0 / d))
            raise ValueError(
                f"belief grid too large: {num_samples}^{d} cells x "
                f"meas_capacity={meas_capacity} = {cells * meas_capacity:.2e} "
                f"elements in update_prior's footprint (budget {budget:.2e}). "
                f"Use num_samples<={fit} at d={d}, reduce meas_capacity, or "
                f"drop angle dims from explr_states and recover them via "
                f"marginalize_angles (the reference's WeightedAvg path)."
            )
        axes = [np.linspace(lo, hi, num_samples) for lo, hi in lims]
        mesh = np.meshgrid(*axes)
        grid = np.stack([m.ravel() for m in mesh], axis=1)
        if scale is None:
            spacing = np.array([a[1] - a[0] for a in axes])
            scale = float(np.max(spacing) * 2.5)
        g = grid.shape[0]
        return cls(
            grid=jnp.asarray(grid, jnp.float32),
            lims=jnp.asarray(lims, jnp.float32),
            prior=jnp.full((g,), 0.5, jnp.float32),  # init_uniform_grid :457-462
            prior_var=jnp.full((g,), 2.0, jnp.float32),
            meas_loc=jnp.zeros((meas_capacity, d), jnp.float32),
            meas_val=jnp.zeros((meas_capacity,), jnp.float32),
            meas_n=jnp.zeros((), jnp.int32),
            count=jnp.zeros((), jnp.int32),
            num_samples=(num_samples,) * d,
            scale=scale,
            thresh=thresh,
            clip=clip,
            invert=invert,
        )

    # ------------------------------------------------------------------
    def push(self, state, val) -> "FingerprintBelief":
        i = self.meas_n % self.meas_loc.shape[0]
        return self.replace(
            meas_loc=self.meas_loc.at[i].set(state),
            meas_val=self.meas_val.at[i].set(val),
            meas_n=jnp.minimum(self.meas_n + 1, self.meas_loc.shape[0]),
        )

    def push_batch(self, states, vals) -> "FingerprintBelief":
        def body(b, sv):
            s, v = sv
            return b.push(s, v), None
        return jax.lax.scan(body, self, (states, vals))[0]

    def _process_meas(self, vals):
        """tanh squashing around the distance threshold (:470-478)."""
        tmp = self.thresh - vals
        tmp = jnp.where(tmp > 0, tmp / self.thresh, tmp / (self.clip - self.thresh))
        return jnp.tanh(tmp)

    def update_prior(self) -> "FingerprintBelief":
        """Precision-weighted Gaussian fusion of the pending measurements
        (parity: update_prior :539-589). No-op when nothing is pending."""
        cap = self.meas_loc.shape[0]
        n = self.meas_n
        has = n > 0
        mask = (jnp.arange(cap) < n).astype(jnp.float32)
        vals = self._process_meas(self.meas_val)

        # measurement footprint over the grid (meas_footprint_vec :417-424)
        std = max(self.scale / 2.0, 1e-6)
        diff = self.grid[:, None, :] - self.meas_loc[None, :, :]  # (G, cap, d)
        pdf = jnp.exp(-0.5 * jnp.sum(jnp.square(diff) / std, axis=-1))  # (G, cap)
        meas_map = renormalize(jnp.where(mask[None, :] > 0, pdf, 1.0), axis=0)
        meas_map = jnp.where(mask[None, :] > 0, meas_map, 0.0)

        meas = (vals / 2.0) + 0.5  # (cap,)
        nf = jnp.maximum(n.astype(jnp.float32), 1.0)
        meas_var = jnp.sum(meas_map, axis=1) / nf
        meas_var = renormalize(meas_var)
        meas_var = _rescale(meas_var, (0.0, 1.0), (50.0 * self.scale, self.scale))

        post_var = 1.0 / (1.0 / self.prior_var + nf / meas_var)
        post = post_var * (
            self.prior / self.prior_var + jnp.sum(meas * mask) / meas_var
        )
        return self.replace(
            prior=jnp.where(has, post, self.prior),
            prior_var=jnp.where(has, post_var, self.prior_var),
            count=self.count + n,
            meas_n=jnp.zeros((), jnp.int32),  # clear_batch :625-629
        )

    # ------------------------------------------------------------------
    def pdf_grid(self, override_invert: bool = False):
        """Belief over the native grid (use_grid path :591-599)."""
        dist = self.prior
        if self.invert and not override_invert:
            dist = -dist + jnp.max(dist) + jnp.min(dist)
        return dist

    def pdf(self, samples, override_invert: bool = False):
        """Belief at arbitrary points by multilinear grid interpolation
        (replaces the scipy RBFInterpolator path :600-603)."""
        d = self.grid.shape[1]
        ns = self.num_samples[0]
        lo = self.lims[:, 0]
        hi = self.lims[:, 1]
        # fractional grid coordinates
        fc = (samples - lo) / (hi - lo) * (ns - 1)
        fc = jnp.clip(fc, 0.0, ns - 1.001)
        base = jnp.floor(fc).astype(jnp.int32)  # (N, d)
        frac = fc - base

        vol = self.prior.reshape(self.num_samples)
        # note: np.meshgrid default indexing 'xy' swaps the first two axes
        if d >= 2:
            vol_idx_order = (1, 0) + tuple(range(2, d))
            vol = jnp.transpose(vol, vol_idx_order)

        def corner(offsets):
            idx = tuple(
                jnp.clip(base[:, k] + offsets[k], 0, ns - 1) for k in range(d)
            )
            w = jnp.prod(
                jnp.stack(
                    [jnp.where(offsets[k] == 1, frac[:, k], 1 - frac[:, k])
                     for k in range(d)], 0
                ), 0
            )
            return vol[idx] * w

        import itertools
        out = sum(corner(off) for off in itertools.product((0, 1), repeat=d))
        if self.invert and not override_invert:
            out = -out + jnp.max(self.prior) + jnp.min(self.prior)
        return out


def marginalize_angles(p_grid, num_samples, plot_idx, method: str = "mean"):
    """Collapse angle dims of a belief grid (process_grid_dist :630-701):
    mean / max / range, plus the sorted weighted-average variants
    'WeightedAvg1' (weights favor the max end) and 'WeightedAvg2' (favor the
    min end) of :672-681. p_grid: (G,) -> marginalized grid over plot_idx."""
    p = p_grid.reshape(num_samples)
    d = len(num_samples)
    extra = tuple(i for i in range(d) if i not in tuple(plot_idx))
    if not extra:
        return p
    if method == "mean":
        return p.mean(axis=extra)
    if method == "max":
        return p.max(axis=extra)
    if method == "range":
        return p.max(axis=extra) - p.min(axis=extra)
    if method.startswith("WeightedAvg"):
        out = p
        # collapse one extra axis at a time: sort along it, weighted-average
        # with geometric weights 0.95^k (ascending or descending)
        for axis in sorted(extra, reverse=True):
            srt = jnp.sort(out, axis=axis)
            n = out.shape[axis]
            k = jnp.arange(n, dtype=jnp.float32)
            w = 0.95 ** (n - k) if "1" in method else 0.95**k
            shape = [1] * out.ndim
            shape[axis] = n
            out = jnp.sum(srt * w.reshape(shape), axis=axis) / jnp.sum(w)
        return out
    raise ValueError(f"invalid angle method {method!r}")
