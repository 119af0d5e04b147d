"""Fingerprint + belief artifact persistence.

Parity targets: the per-fingerprint capture pickles
{z_mu, z_var, x, center, center_img} (build_fingerprints:327-337), loaded
by FingerprintID (fingerprint_module.py:188-205), and the belief snapshots
of FingerprintDist.save_results (:528-538). Stored as npz instead of
pickles (portable, no code execution on load). Reference ``.pickle``
inputs (the migration seam) go through a restricted unpickler that only
admits numpy array reconstruction — arbitrary objects are refused, so a
hostile pickle cannot execute code through this path either.
"""

from __future__ import annotations

import io as _io
import os
import pickle
import warnings

import numpy as np

_FP_KEYS = ("z_mu", "z_var", "x", "center", "center_img")


class _NumpyOnlyUnpickler(pickle.Unpickler):
    """weights_only-style loader: numpy array machinery and nothing else.

    The reference's capture pickles hold dicts of plain ndarrays
    (fingerprint_builder.py:94 detaches to numpy before dumping), so this
    whitelist is sufficient for every legitimate artifact while refusing
    the GLOBAL opcodes an attacker would need for code execution.
    """

    _ALLOWED = {
        ("numpy.core.multiarray", "_reconstruct"),
        ("numpy._core.multiarray", "_reconstruct"),
        ("numpy.core.multiarray", "scalar"),
        ("numpy._core.multiarray", "scalar"),
        ("numpy", "ndarray"),
        ("numpy", "dtype"),
        ("numpy.dtypes", "Float32DType"),
        ("numpy.dtypes", "Float64DType"),
        ("numpy.dtypes", "Int64DType"),
        ("numpy.dtypes", "Int32DType"),
        ("numpy.dtypes", "UInt8DType"),
        ("numpy.dtypes", "BoolDType"),
    }

    def find_class(self, module, name):
        if (module, name) in self._ALLOWED:
            return super().find_class(module, name)
        raise pickle.UnpicklingError(
            f"refusing to unpickle {module}.{name}: fingerprint pickles may "
            f"only contain numpy arrays (restricted loader)")


def _safe_pickle_load(path):
    with open(path, "rb") as f:
        return _NumpyOnlyUnpickler(_io.BytesIO(f.read())).load()


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
    directory_mode = isinstance(paths, (str, os.PathLike))
    if directory_mode:
        d = str(paths)
        paths = sorted(
            os.path.join(d, f) for f in os.listdir(d)
            if f.endswith((".npz", ".pickle"))
        )
    out = []
    for p in paths:
        if str(p).endswith(".pickle"):
            try:
                out.append(_load_reference_pickle(p))
            except (KeyError, ValueError, pickle.UnpicklingError) as e:
                # reference run dirs also hold non-fingerprint pickles
                # (belief snapshots with string fields, explr_update_info,
                # ergodic_cost) — in directory mode skip them with a
                # warning; an explicitly-listed path still fails loudly
                if not directory_mode:
                    raise
                warnings.warn(
                    f"skipping {p}: not a fingerprint capture pickle ({e})",
                    stacklevel=2)
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

    Loaded through the numpy-only restricted unpickler; a pickle holding
    anything but arrays (or missing the capture keys) raises.
    """
    d = _safe_pickle_load(path)
    if not isinstance(d, dict) or not all(k in d for k in _FP_KEYS):
        missing = _FP_KEYS if not isinstance(d, dict) else [
            k for k in _FP_KEYS if k not in d]
        raise KeyError(f"missing fingerprint keys {missing}")
    d = {k: np.asarray(v, np.float32) for k, v in d.items()
         if not isinstance(v, (str, bytes))}
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
