"""Fingerprint + belief artifact persistence.

Parity targets: the per-fingerprint capture pickles
{z_mu, z_var, x, center, center_img} (build_fingerprints:327-337), loaded
by FingerprintID (fingerprint_module.py:188-205), and the belief snapshots
of FingerprintDist.save_results (:528-538). Stored as npz instead of
pickles (portable, no code execution on load).
"""

from __future__ import annotations

import os

import numpy as np

_FP_KEYS = ("z_mu", "z_var", "x", "center", "center_img")


def save_fingerprint(path: str, fp: dict) -> str:
    """Write one capture artifact; appends .npz if missing."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(fp[k]) for k in _FP_KEYS})
    return path


def load_fingerprints(paths):
    """Load capture artifacts -> list of dicts (FingerprintSet.from_lists
    input). Accepts a directory (all *.npz inside) or explicit paths."""
    if isinstance(paths, (str, os.PathLike)):
        d = str(paths)
        paths = sorted(
            os.path.join(d, f) for f in os.listdir(d) if f.endswith(".npz")
        )
    out = []
    for p in paths:
        data = np.load(p)
        out.append({k: data[k] for k in _FP_KEYS})
    return out


def save_beliefs(path: str, beliefs, names=None) -> str:
    """Snapshot belief grids (FingerprintDist.save_results parity) in the
    format scripts/capture_fingerprint_belief.py consumes:
    grids (K, G, d), priors (K, G), prior_vars (K, G), lims (K, d, 2)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(
        path,
        grids=np.stack([np.asarray(b.grid) for b in beliefs]),
        priors=np.stack([np.asarray(b.prior) for b in beliefs]),
        prior_vars=np.stack([np.asarray(b.prior_var) for b in beliefs]),
        lims=np.stack([np.asarray(b.lims) for b in beliefs]),
        counts=np.asarray([int(b.count) for b in beliefs]),
        names=np.asarray(names if names is not None
                         else [f"fp{i}" for i in range(len(beliefs))]),
    )
    return path


def load_beliefs(path: str, explr_states: str, num_samples: int = 50,
                 **belief_kwargs):
    """Rebuild FingerprintBelief pytrees from a snapshot (resumable belief
    state — the reference re-reads its pickles for downstream plotting)."""
    import jax.numpy as jnp
    from .belief import FingerprintBelief

    data = np.load(path, allow_pickle=False)
    out = []
    for k in range(data["grids"].shape[0]):
        # reconstruct with matching grid resolution, then inject state
        ns = round(data["grids"].shape[1] ** (1.0 / data["grids"].shape[2]))
        b = FingerprintBelief.create(
            explr_states,
            # invert create()'s 1.15x (and yaw 1.33x) expansion so the
            # rebuilt grid matches the stored one exactly
            _unexpand_lims(explr_states, data["lims"][k]),
            num_samples=ns, **belief_kwargs,
        )
        b = b.replace(
            grid=jnp.asarray(data["grids"][k]),
            lims=jnp.asarray(data["lims"][k]),
            prior=jnp.asarray(data["priors"][k]),
            prior_var=jnp.asarray(data["prior_vars"][k]),
            count=jnp.asarray(int(data["counts"][k]), jnp.int32),
        )
        out.append(b)
    return out, [str(n) for n in data["names"]]


def _unexpand_lims(explr_states: str, lims):
    lims = np.asarray(lims, np.float64) / 1.15
    if "w" in explr_states:
        lims[explr_states.rfind("w")] /= 1.33
    return lims
