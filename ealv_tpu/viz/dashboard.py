"""Live run dashboard — the reference's streaming plotters, TPU-shaped.

Parity targets (role): the live pyqtgraph Plotter (sensor view, latent,
reconstruction, path, target + time-averaged dists, cost;
plotting_pyqtgraph.py:31-509) and the gridded Plotter3D variant
(plotting_matplotlib.py:310-520 — interpolated 50x50 distribution panels,
path + planned states overlay).

The reference streams frames to display processes over queues. Here the
TPU loop stays fused; every ``dash_every`` steps ONE jitted payload program
gathers everything the dashboard needs (sensor view, reconstruction,
latent stats, gridded p/q fields, path + plan) in a single device->host
transfer, and matplotlib renders it to ``dashboard.png`` — replaced
atomically so a watcher (browser open on ``dashboard.html``, or any image
viewer that re-reads the file) sees a live-updating view of the run.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from .plotting import set_mpl_format  # noqa: E402

_HTML = """<!doctype html>
<html><head><meta http-equiv="refresh" content="2">
<title>ealv_tpu live run</title></head>
<body style="background:#111;text-align:center">
<img src="dashboard.png" style="max-width:100%%">
</body></html>
"""


class LiveDashboard:
    """Renders the live explore+learn dashboard for an ``Experiment``."""

    def __init__(self, exp, dir_path: str, grid: int = 50, plot_idx=(0, 1)):
        self.exp = exp
        self.dir_path = dir_path
        self.plot_idx = list(plot_idx)
        os.makedirs(dir_path, exist_ok=True)
        with open(os.path.join(dir_path, "dashboard.html"), "w") as f:
            f.write(_HTML)

        lim = np.asarray(exp.cfg.robot_lim, np.float32)[self.plot_idx]
        self.extent = [lim[0, 0], lim[0, 1], lim[1, 0], lim[1, 1]]
        xs = np.linspace(lim[0, 0], lim[0, 1], grid, dtype=np.float32)
        ys = np.linspace(lim[1, 0], lim[1, 1], grid, dtype=np.float32)
        gx, gy = np.meshgrid(xs, ys, indexing="xy")
        d = len(exp.cfg.states)
        samp = np.zeros((grid * grid, d), np.float32)
        samp[:, self.plot_idx[0]] = gx.ravel()
        samp[:, self.plot_idx[1]] = gy.ravel()
        self._samples = jnp.asarray(samp)
        self.grid = grid
        self._payload = jax.jit(self._payload_fn)

    def _payload_fn(self, es):
        exp = self.exp
        cfg = exp.cfg
        pose, vel, force, img = exp.env.observe(es.env)
        x = exp._measured_robot_state(es.env)[: cfg.s_dim]
        y = img
        if cfg.image_dim[2] == 1 and y.shape[-1] != 1:
            y = jnp.mean(y, axis=-1, keepdims=True)
        force_b = force[None] if exp.model.learn_force else None
        out = exp.model.apply(es.params, x[None], y[None], force=force_b,
                              train=False)
        payload = {
            "image": img,
            "img_pred": out["img_pred"][0],
            "z_mu": out["z_mu"][0],
            "z_var": jnp.exp(out["z_logvar"][0]),
        }
        traj, mask = es.pstate.memory.get_all()
        payload["path"] = traj
        payload["path_mask"] = mask
        if exp.use_baseline:
            # BaselineState: no plan rollout / target dist to show
            payload["plan"] = es.pstate.x[None, :]
            payload["cur"] = es.pstate.x
        else:
            payload["plan"] = es.pstate.last_plan
            payload["cur"] = es.pstate.dyn.x
            _, p, q = exp.planner.plot_dists(
                es.pstate, (es.params, es.mstate), self._samples,
                jnp.asarray(self.plot_idx),
            )
            payload["p"] = p.reshape(self.grid, self.grid)
            payload["q"] = q.reshape(self.grid, self.grid)
        return payload

    def render(self, es, series=None, step: int = 0) -> str:
        """One dashboard frame; returns the png path. ``series`` is the
        MetricsLog.series dict (loss / ergodic_cost / beta / gamma)."""
        pl = jax.device_get(self._payload(es))
        set_mpl_format()
        fig, axs = plt.subplots(2, 3, figsize=(11, 6.5))

        ax = axs[0, 0]
        ax.imshow(np.clip(pl["image"], 0, 1))
        ax.set_title(f"sensor view (step {step})")
        ax.axis("off")

        ax = axs[0, 1]
        rec = pl["img_pred"]
        ax.imshow(np.clip(rec if rec.shape[-1] != 1 else rec[..., 0], 0, 1),
                  cmap=None if rec.shape[-1] != 1 else "gray")
        ax.set_title("reconstruction")
        ax.axis("off")

        ax = axs[0, 2]
        idx = np.arange(len(pl["z_mu"]))
        ax.bar(idx, pl["z_mu"], yerr=np.sqrt(pl["z_var"]), color="tab:blue")
        ax.set_title("latent z (mu +- std)")

        i0, i1 = self.plot_idx
        mask = pl["path_mask"] > 0
        path = pl["path"][mask]
        for col, key, cmap, title in (
            (0, "p", "viridis", "target dist p"),
            (1, "q", "magma", "time-averaged q"),
        ):
            ax = axs[1, col]
            if key in pl:
                ax.imshow(pl[key], origin="lower", cmap=cmap,
                          extent=self.extent, aspect="auto")
            if len(path):
                ax.plot(path[:, i0], path[:, i1], "w.", ms=2, alpha=0.6)
            ax.plot(pl["plan"][:, i0], pl["plan"][:, i1], "c.-", ms=3, lw=0.8)
            ax.plot(pl["cur"][i0], pl["cur"][i1], "gs", ms=8)
            ax.set_title(title)
            ax.set_xlim(self.extent[:2])
            ax.set_ylim(self.extent[2:])

        ax = axs[1, 2]
        if series:
            for k in ("ergodic_cost", "loss"):
                v = series.get(k)
                if v is not None and len(v):
                    vv = np.concatenate([np.atleast_1d(a) for a in v])
                    vv = vv[np.nonzero(vv)[0]] if k == "loss" else vv
                    if len(vv):
                        ax.plot(vv, label=k, lw=0.8)
            ax.legend(fontsize=6)
            ax.set_title("curves")
            ax.set_xlabel("explr step")

        tmp = os.path.join(self.dir_path, ".dashboard.tmp.png")
        final = os.path.join(self.dir_path, "dashboard.png")
        fig.savefig(tmp)
        plt.close(fig)
        os.replace(tmp, final)
        return final
