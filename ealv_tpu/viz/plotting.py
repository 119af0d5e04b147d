"""Offline visualization — the reference's dashboards, headless.

Parity targets (role, not pixel-for-pixel): the pyqtgraph/matplotlib
dashboards of franka_test/scripts/plotting/ — Plotter (sensor view, latent
mu/var, reconstruction, path, time-averaged + target distributions, ergodic
cost; plotting_pyqtgraph.py:31-509), TrainingPlotter (:510), EvalPlotter
(seed/actual/imagined + latent bars, plotting_matplotlib.py:678), the
cluster figure (clustering.py draw_fig :526-573), the belief heatmaps
(FingerprintsPlotter, fingerprint_module.py:703-870), and the house style
set_mpl_format (plotting_matplotlib.py:14).

The reference streams these live from dedicated plotter processes; here
figures render offline from logged arrays (metrics.npz / tick infos) to
files — the TPU loop never blocks on drawing. All figures use the Agg
backend and return the saved path.
"""

from __future__ import annotations

import os

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def set_mpl_format():
    """House style (parity: plotting_matplotlib.set_mpl_format :14)."""
    plt.rcParams.update({
        "font.size": 9,
        "axes.titlesize": 9,
        "axes.labelsize": 8,
        "figure.dpi": 120,
        "savefig.bbox": "tight",
    })


def _save(fig, dir_path, name):
    os.makedirs(dir_path, exist_ok=True)
    path = os.path.join(dir_path, name)
    fig.savefig(path)
    plt.close(fig)
    return path


class ExplorationPlotter:
    """Live-exploration dashboard: camera view, reconstruction, latent
    state, path, target vs time-averaged distribution, ergodic cost."""

    def __init__(self, dir_path: str, robot_lim=None):
        set_mpl_format()
        self.dir_path = dir_path
        self.robot_lim = np.asarray(robot_lim) if robot_lim is not None else None

    def render(self, *, image, img_pred=None, z_mu=None, z_var=None,
               path_xy=None, samples=None, p=None, q=None, costs=None,
               step: int = 0, name: str | None = None):
        fig, axs = plt.subplots(2, 3, figsize=(10, 6))
        ax = axs[0, 0]
        ax.imshow(np.clip(np.asarray(image), 0, 1))
        ax.set_title(f"sensor view (step {step})")
        ax.axis("off")

        ax = axs[0, 1]
        if img_pred is not None:
            ax.imshow(np.clip(np.asarray(img_pred), 0, 1))
            ax.set_title("model reconstruction")
        ax.axis("off")

        ax = axs[0, 2]
        if z_mu is not None:
            idx = np.arange(len(z_mu))
            ax.bar(idx, np.asarray(z_mu),
                   yerr=np.sqrt(np.asarray(z_var)) if z_var is not None else None,
                   color="tab:blue")
            ax.set_title("latent z (mu +- std)")

        ax = axs[1, 0]
        if samples is not None and p is not None:
            s = np.asarray(samples)
            ax.tricontourf(s[:, 0], s[:, 1], np.asarray(p), levels=20,
                           cmap="viridis")
            ax.set_title("target dist p")
        if path_xy is not None:
            pa = np.asarray(path_xy)
            ax.plot(pa[:, 0], pa[:, 1], "w.-", ms=2, lw=0.5)
        self._box(ax)

        ax = axs[1, 1]
        if samples is not None and q is not None:
            s = np.asarray(samples)
            ax.tricontourf(s[:, 0], s[:, 1], np.asarray(q), levels=20,
                           cmap="magma")
            ax.set_title("time-averaged dist q")
        self._box(ax)

        ax = axs[1, 2]
        if costs is not None:
            ax.plot(np.asarray(costs))
            ax.set_title("ergodic cost D_KL")
            ax.set_xlabel("explr step")

        return _save(fig, self.dir_path, name or f"explr_{step:05d}.png")

    def _box(self, ax):
        if self.robot_lim is not None:
            ax.set_xlim(self.robot_lim[0])
            ax.set_ylim(self.robot_lim[1])
        ax.set_aspect("equal", "box")


class TrainingPlotter:
    """Loss / schedule curves (parity: update_loss_plots,
    trainer_module.py:56-196)."""

    def __init__(self, dir_path: str):
        set_mpl_format()
        self.dir_path = dir_path

    def render(self, series: dict, name: str = "training.png"):
        keys = [k for k in ("loss", "rc", "kl", "rc_other", "beta", "gamma",
                            "ergodic_cost", "active_units")
                if k in series and len(np.ravel(series[k]))]
        n = max(len(keys), 1)
        fig, axs = plt.subplots((n + 2) // 3, 3, figsize=(10, 2.6 * ((n + 2) // 3)),
                                squeeze=False)
        for ax, k in zip(axs.ravel(), keys):
            ax.plot(np.ravel(series[k]))
            ax.set_title(k)
        for ax in axs.ravel()[len(keys):]:
            ax.axis("off")
        return _save(fig, self.dir_path, name)


class EvalPlotter:
    """Seed / actual / imagined triptych + latent bars (parity:
    plotting_matplotlib.EvalPlotter :678)."""

    def __init__(self, dir_path: str):
        set_mpl_format()
        self.dir_path = dir_path

    def render(self, seed_img, actual_img, imagined_img, z_mu=None, z_var=None,
               name: str = "eval.png"):
        fig, axs = plt.subplots(1, 4 if z_mu is not None else 3, figsize=(12, 3))
        for ax, img, title in zip(
            axs, [seed_img, actual_img, imagined_img],
            ["seed", "actual", "imagined"],
        ):
            ax.imshow(np.clip(np.asarray(img), 0, 1))
            ax.set_title(title)
            ax.axis("off")
        if z_mu is not None:
            ax = axs[-1]
            idx = np.arange(len(z_mu))
            ax.bar(idx, np.asarray(z_mu),
                   yerr=np.sqrt(np.asarray(z_var)) if z_var is not None else None)
            ax.set_title("latent")
        return _save(fig, self.dir_path, name)


class MultiEvalPlotter:
    """Grid of seed/actual/imagined rows across several poses (parity:
    plotting_matplotlib.MultiEvalPlotter :915 / FPEvalPlotter :848)."""

    def __init__(self, dir_path: str):
        set_mpl_format()
        self.dir_path = dir_path

    def render(self, rows, name: str = "multi_eval.png"):
        """rows: list of (seed_img, actual_img, imagined_img[, label])."""
        n = len(rows)
        fig, axs = plt.subplots(n, 3, figsize=(7.5, 2.4 * n), squeeze=False)
        for r, row in enumerate(rows):
            label = row[3] if len(row) > 3 else f"pose {r}"
            for c, (img, title) in enumerate(
                zip(row[:3], ["seed", "actual", "imagined"])
            ):
                ax = axs[r, c]
                ax.imshow(np.clip(np.asarray(img), 0, 1))
                if r == 0:
                    ax.set_title(title)
                if c == 0:
                    ax.set_ylabel(label)
                ax.set_xticks([])
                ax.set_yticks([])
        return _save(fig, self.dir_path, name)


class BeliefPlotter:
    """Belief-grid heatmaps per fingerprint (parity: FingerprintsPlotter,
    fingerprint_module.py:703-870), marginalized over angle dims."""

    def __init__(self, dir_path: str):
        set_mpl_format()
        self.dir_path = dir_path

    def render(self, beliefs, names=None, plot_idx=(0, 1), method: str = "mean",
               truth_xy=None, name: str = "beliefs.png"):
        from ..fingerprint.belief import marginalize_angles

        k = len(beliefs)
        fig, axs = plt.subplots(1, k, figsize=(4 * k, 3.6), squeeze=False)
        for i, (ax, b) in enumerate(zip(axs[0], beliefs)):
            marg = np.asarray(
                marginalize_angles(b.pdf_grid(), b.num_samples, plot_idx, method)
            )
            lims = np.asarray(b.lims)
            ax.imshow(
                marg, origin="lower", cmap="gist_heat",
                extent=[*lims[plot_idx[0]], *lims[plot_idx[1]]], aspect="auto",
            )
            flat = int(np.argmax(np.asarray(b.pdf_grid())))
            peak = np.asarray(b.grid)[flat]
            ax.plot(peak[plot_idx[0]], peak[plot_idx[1]], "c*", ms=12,
                    label="belief peak")
            if truth_xy is not None:
                ax.plot(truth_xy[i][0], truth_xy[i][1], "wo", mfc="none", ms=12,
                        label="truth")
            ax.set_title(names[i] if names else f"fingerprint {i}")
            ax.legend(loc="upper right", fontsize=6)
        return _save(fig, self.dir_path, name)


def plot_entropy_slices(dir_path, slices, prefix: str = "entropy_dist"):
    """Entropy-slice figures (parity: get_dists, fingerprint_builder.py:
    404-417): one tricontourf of the marginal uncertainty field per
    z-range variant. ``slices`` is the {name: (plot_samples, marginal)}
    dict from fingerprint.entropy.entropy_slices. Returns saved paths."""
    set_mpl_format()
    paths = []
    for name, (samples, dist) in slices.items():
        fig, ax = plt.subplots(1, 1, figsize=(4, 4))
        s = np.asarray(samples)
        ax.tricontourf(s[:, 0], s[:, 1], np.asarray(dist), levels=30,
                       cmap="gist_heat")
        ax.set_aspect("equal", "box")
        ax.set_xlabel("x")
        ax.set_ylabel("y")
        fig.tight_layout()
        paths.append(_save(fig, dir_path, f"{prefix}_{name}.png"))
    return paths


def plot_clusters(dir_path, points, labels, means, samples=None, weights=None,
                  last_means=None, name: str = "clusters.png"):
    """Cluster figure (parity: clustering.draw_fig :526-573): labeled points
    + new/old centers, and the uncertainty heatmap that produced them."""
    set_mpl_format()
    fig, axs = plt.subplots(1, 2, figsize=(8, 3.6))
    ax = axs[0]
    labels = np.asarray(labels)
    pts = np.asarray(points)
    for lbl in np.unique(labels):
        m = labels == lbl
        ax.scatter(pts[m, 0], pts[m, 1], s=4,
                   label=("outlier" if lbl < 0 else f"cluster {lbl}"))
    for j, mu in enumerate(np.asarray(means)):
        ax.scatter(*mu[:2], marker="o", s=180, edgecolor="white", zorder=5)
    if last_means is not None:
        for mu in np.asarray(last_means):
            ax.scatter(*mu[:2], marker="^", s=180, edgecolor="white", zorder=5)
    ax.set_title("clusters (o new, ^ old)")
    ax.legend(fontsize=6)

    ax = axs[1]
    if samples is not None and weights is not None:
        s = np.asarray(samples)
        ax.tricontourf(s[:, 0], s[:, 1], np.asarray(weights), levels=10,
                       cmap="gist_heat")
    ax.set_title("uncertainty field")
    return _save(fig, dir_path, name)
