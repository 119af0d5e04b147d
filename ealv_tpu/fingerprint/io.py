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
    input). Accepts a directory (all *.npz / *.pickle inside) or explicit
    paths. Reference-format ``.pickle`` files (build_fingerprints:327-337)
    load directly — migration seam for fingerprints captured by the torch
    stack (pair with scripts/import_torch_checkpoint.py for the model so
    the stored z's live in the same latent space)."""
    if isinstance(paths, (str, os.PathLike)):
        d = str(paths)
        paths = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.endswith((".npz", ".pickle"))
        )
    out = []
    for p in paths:
        if str(p).endswith(".pickle"):
            out.append(_load_reference_pickle(p))
        else:
            data = np.load(p)
            out.append({k: data[k] for k in _FP_KEYS})
    return out


def _load_reference_pickle(path):
    """One reference fingerprint pickle -> our capture-dict convention.

    Two bridges (both verified against the reference source):
      - the reference's ``z_var`` is the VARIANCE (z_logvar.exp(),
        fingerprint_builder.py:93-94); our artifacts keep the LOGVAR under
        that key — convert with log()
      - ``center_img`` may be channel-first; our convention is (H, W, C)
    """
    import pickle

    with open(path, "rb") as f:
        d = pickle.load(f)
    d = {k: np.asarray(v, np.float32) for k, v in d.items()}
    var = np.clip(d["z_var"], 1e-12, None)
    img = d["center_img"]
    if img.ndim == 3 and img.shape[0] in (1, 3) and img.shape[-1] not in (1, 3):
        img = img.transpose(1, 2, 0)
    out = {
        "z_mu": d["z_mu"],
        "z_var": np.log(var),
        "x": d["x"],
        "center": d["center"],
        "center_img": img,
    }
    if "force" in d:
        out["force"] = d["force"]
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
