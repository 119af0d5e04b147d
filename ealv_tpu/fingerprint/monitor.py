"""Online clustering monitor with stability-gated checkpointing.

Parity target: the Clustering process (dist_modules/clustering.py:396-573):
periodically re-cluster the live model's uncertainty field, compare against
the previous clusters via the permutation-minimal MSE, declare "stable" when
error < 1e-3, and checkpoint the model at that moment; keep a cluster log
(step, error, num_clusters, clusters, stable) written as CSV (:600-603).

TPU-first: instead of a separate OS process hot-reloading checkpoints, the
monitor is called inline with the CURRENT params (sharing is by
construction); the clustering itself is the jitted pipeline of
fingerprint.clustering.
"""

from __future__ import annotations

import csv
import itertools
import os
from dataclasses import dataclass, field

import numpy as np
import jax

from .clustering import find_clusters


def cluster_stability_error(means_a, means_b):
    """Permutation-minimal mean squared error between two cluster sets
    (parity: clustering.py:505-513). Returns np.inf on count mismatch."""
    means_a, means_b = np.asarray(means_a), np.asarray(means_b)
    if len(means_a) != len(means_b) or len(means_a) == 0:
        return np.inf
    best = np.inf
    for perm in itertools.permutations(range(len(means_b))):
        err = np.mean(np.sum((means_a - means_b[list(perm)]) ** 2, axis=1))
        best = min(best, err)
    return best


@dataclass
class ClusteringMonitor:
    model: object
    robot_lim: object
    num_pts: int = 1000
    stable_thresh: float = 1e-3
    dir_path: str | None = None
    cluster_kwargs: dict = field(default_factory=dict)
    last_clusters: np.ndarray | None = None
    log: list = field(default_factory=list)

    def update(self, params, seeds_x, seeds_y, key, explr_step: int,
               checkpoint_fn=None):
        """One clustering pass; returns (result, stable). When stable and a
        ``checkpoint_fn`` is given, it is invoked (the reference saves
        model_final_{N}steps_cluster_checkpoint.pth, :485-487,515-516)."""
        res = find_clusters(
            self.model, params, seeds_x, seeds_y, key,
            robot_lim=self.robot_lim, num_pts=self.num_pts,
            **self.cluster_kwargs,
        )
        stable = False
        error = np.inf
        if self.last_clusters is not None:
            error = cluster_stability_error(res.means, self.last_clusters)
            stable = error < self.stable_thresh
            if stable and checkpoint_fn is not None:
                checkpoint_fn(explr_step)
        self.log.append({
            "step": explr_step,
            "error": float(error) if np.isfinite(error) else "NA",
            "num_clusters": len(res.means),
            "clusters": res.means.tolist(),
            "stable": stable,
        })
        self.last_clusters = res.means
        return res, stable

    def save_log(self, name: str = "cluster_log.csv"):
        """CSV log parity (clustering.py:600-603)."""
        if not self.dir_path:
            return None
        os.makedirs(self.dir_path, exist_ok=True)
        path = os.path.join(self.dir_path, name)
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(
                f, fieldnames=["step", "error", "num_clusters", "clusters", "stable"]
            )
            w.writeheader()
            w.writerows(self.log)
        return path
