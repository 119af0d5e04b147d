"""Offline model evaluation on collected test sets.

Parity target: the reference's eval artifacts — data_eval_dict_*.pickle
snapshots (trainer post_train_mp eval images, trainer_module.py:547-611) and
the grid-sweep test sets captured "for debugging purposes"
(scripts/sensor_test_set, README.md:162) that downstream plots replay.

``evaluate_test_set`` runs the CVAE over a (pose, image) test set in one
batched call: per-sample reconstruction NLL/MSE, latent stats, and
cross-pose "imagined" decodes (seed with sample i, decode at pose j).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..models import CVAE, gaussian_nll
from ..models.cvae import init_model_state, update_dist


def evaluate_test_set(model: CVAE, params, poses, images, forces=None):
    """poses: (N, s_dim) robot coords, images: (N, H, W, C).

    Returns a metrics dict with per-sample and aggregate reconstruction
    quality plus latent activity (the trainer's active-units diagnostics
    applied to held-out data)."""
    poses = jnp.asarray(poses)
    images = jnp.asarray(images)
    force = jnp.asarray(forces) if (forces is not None and model.learn_force) else None

    @jax.jit
    def run(params, x, y, f):
        out = model.apply(params, x, y, force=f, train=False)
        mse = jnp.mean((out["img_pred"] - y) ** 2, axis=(1, 2, 3))
        nll = jax.vmap(
            lambda yy, yp, lv: gaussian_nll(yy[None], yp[None], lv[None])
        )(y, out["img_pred"], out["img_logvar"])
        return out, mse, nll

    out, mse, nll = run(params, poses, images, force)
    z_mu = np.asarray(out["z_mu"])
    vars_of_means = z_mu.var(axis=0)
    return {
        "recon_mse": np.asarray(mse),
        "recon_nll": np.asarray(nll),
        "mean_mse": float(np.mean(np.asarray(mse))),
        "mean_nll": float(np.mean(np.asarray(nll))),
        "z_mu": z_mu,
        "z_logvar": np.asarray(out["z_logvar"]),
        "active_units": int((vars_of_means > 0.01).sum()),
        "img_pred": np.asarray(out["img_pred"]),
    }


def imagined_views(model: CVAE, params, seed_pose, seed_image, query_poses,
                   seed_force=None):
    """Seed the model with one (pose, image) and decode image predictions at
    arbitrary query poses — the "imagined view" panel of the reference's
    EvalPlotter (seed/actual/imagined, plotting_matplotlib.py:678)."""
    mstate = init_model_state(model)
    mstate, _ = update_dist(
        model, params, mstate, jnp.asarray(seed_pose), jnp.asarray(seed_image),
        jnp.asarray(seed_force) if seed_force is not None else None,
    )
    y_logvar, feat = model.apply(
        params, mstate, jnp.asarray(query_poses), method=CVAE.decode_samples
    )
    imgs = model.apply(params, feat, method=CVAE.img_decode)
    return np.asarray(imgs), np.asarray(y_logvar)


def eval_report(model: CVAE, params, test_set_path: str, dir_path: str,
                n_panels: int = 4):
    """Full offline eval: metrics + seed/actual/imagined figure panels from
    a collect_test_set.py npz. Returns the metrics dict."""
    from ..viz import EvalPlotter

    data = np.load(test_set_path)
    poses, images = data["poses"], data["images"]
    # robot-coord poses for the model: test sets store tray poses
    from ..utils.config import ExperimentConfig
    cfg = ExperimentConfig()
    from ..utils.states import ws_conversion
    sel = cfg.sel()
    poses_r = np.asarray(ws_conversion(
        jnp.asarray(poses[:, sel]), jnp.asarray(cfg.tray_lim),
        jnp.asarray(cfg.robot_lim),
    ))

    metrics = evaluate_test_set(model, params, poses_r, images)
    pl = EvalPlotter(dir_path)
    for i in range(min(n_panels, len(poses_r) - 1)):
        imagined, _ = imagined_views(model, params, poses_r[i], images[i],
                                     poses_r[i + 1 : i + 2])
        pl.render(images[i], images[i + 1], imagined[0],
                  z_mu=metrics["z_mu"][i],
                  z_var=np.exp(metrics["z_logvar"][i]),
                  name=f"eval_{i}.png")
    return metrics
