"""Fingerprint identification experiment — exploration + live localization.

Parity target: test_fingerprint_main.py + scripts/fingerprint_mp (SURVEY.md
§3.5): an explorer collects (pose, image) samples; per-fingerprint workers
match each sample against stored signatures and fuse relative-pose beliefs;
after ``update_tdist_step`` the explorer adopts a fingerprint's belief as
its exploration target (seek the object).

TPU-first: the reference spawns one worker process per (model, dist-method)
plus a shared FingerprintBufferTorch ring; here the K-fingerprint matching
is one vmapped call per observation and the "workers" are belief pytrees
updated inline. The belief adoption is just switching the pdf ctx passed to
the planner.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..utils.config import ExperimentConfig
from ..runtime.tester import EvalExperiment
from .identify import FingerprintSet, update_beliefs
from .belief import FingerprintBelief


@dataclass
class FingerprintTestRuntime:
    cfg: ExperimentConfig
    model: object
    params: object
    fps: FingerprintSet
    dist_method: str = "L2"
    error_mode: bool = False
    update_tdist_step: int = 50  # adopt a belief as target after this step
    seek_fingerprint: int = 0  # which fingerprint's belief to adopt
    scene: object = None
    beliefs: list = field(default_factory=list)
    history: list = field(default_factory=list)

    def __post_init__(self):
        k = int(self.fps.center.shape[0])
        if not self.beliefs:
            # adaptive match thresholds from the fingerprints' separation
            # (fingerprint_module.py:154-161)
            from .identify import calibrate_thresholds
            thresh, clip = calibrate_thresholds(self.fps, self.dist_method)
            self.beliefs = [
                FingerprintBelief.create(self.cfg.states, self.cfg.robot_lim,
                                         thresh=thresh, clip=clip)
                for _ in range(k)
            ]
        # planner target = a FingerprintBelief's interpolated pdf; a fresh
        # belief is uniform, so pre-adoption exploration is uniform
        self._ev = EvalExperiment(
            self.cfg, lambda ctx, samples: ctx.pdf(samples), scene=self.scene
        )

    def run(self, n_steps: int, seed: int = 0, update_every: int = 1):
        """Explore for n_steps, updating all fingerprint beliefs from every
        observation; adopt the sought fingerprint's belief as the target
        distribution after update_tdist_step (test_fingerprint_main:262-268).
        Returns (beliefs, history of per-step dicts)."""
        ev = self._ev.init(seed=seed)
        tick = jax.jit(self._ev.tick)
        neutral = self.beliefs[self.seek_fingerprint]
        for step in range(n_steps):
            target = (
                self.beliefs[self.seek_fingerprint]
                if step >= self.update_tdist_step
                else neutral.replace(
                    prior=jnp.full_like(neutral.prior, 0.5),
                    prior_var=jnp.full_like(neutral.prior_var, 2.0),
                )
            )
            ev, obs = tick(ev, target)
            if step % update_every == 0:
                self.beliefs, dists = update_beliefs(
                    self.model, self.params, self.fps, self.beliefs,
                    obs["robot_state"], obs["image"],
                    states=self.cfg.states,
                    robot_lim=self.cfg.robot_lim, tray_lim=self.cfg.tray_lim,
                    dist_method=self.dist_method, error_mode=self.error_mode,
                )
                self.history.append({
                    "step": step,
                    "dists": np.asarray(dists),
                    "robot_state": np.asarray(obs["robot_state"]),
                })
        return self.beliefs, self.history

    def belief_peaks(self):
        """argmax location of each fingerprint's belief grid."""
        peaks = []
        for b in self.beliefs:
            idx = int(np.argmax(np.asarray(b.pdf_grid())))
            peaks.append(np.asarray(b.grid)[idx])
        return np.stack(peaks)

    def save(self, path: str, names=None) -> str:
        """Persist the belief grids (FingerprintDist.save_results parity) in
        the format capture_fingerprint_belief.py consumes."""
        from .io import save_beliefs
        return save_beliefs(path, self.beliefs, names)
