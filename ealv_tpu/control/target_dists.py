"""Target distributions for the ergodic planner.

Parity targets: klerg.py PriorDist :27-50, dummyTestDist :53-66, normalEnv
:68-81, the uniform_dist of the demo :762-778, SensorTest's ExplrDist
(sensor_test_module.py:229-278) and AvoidDist (memory_buffer.py:95-147).

Each distribution is a (ctx pytree, pure pdf) pair so the planner can jit
over it: ``pdf(ctx, samples (N, d)) -> (N,)`` unnormalized density.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct


class GaussianMixtureDist(NamedTuple):
    """Sum of diagonal Gaussians + floor. Parity: PriorDist.pdf_torch
    (klerg.py:49-50) and dummyTestDist (single component, :53-66)."""

    means: jax.Array  # (K, d)
    vars: jax.Array  # (K, d) diagonal covariance
    floor: float = 0.0

    def pdf(self, samples):
        d = self.means.shape[1]
        diff = samples[:, None, :] - self.means[None, :, :]  # (N, K, d)
        maha = jnp.sum(diff**2 / self.vars[None], axis=-1)
        log_norm = -0.5 * (d * jnp.log(2 * jnp.pi) + jnp.sum(jnp.log(self.vars), -1))
        comp = jnp.exp(-0.5 * maha + log_norm[None, :])
        return jnp.sum(comp, axis=1) + self.floor


def gaussian_dist(center, covar_diag, floor: float = 0.0) -> GaussianMixtureDist:
    """Single diagonal Gaussian (the planner demo's dummyTestDist)."""
    center = jnp.atleast_2d(jnp.asarray(center, jnp.float32))
    covar = jnp.atleast_2d(jnp.asarray(covar_diag, jnp.float32))
    return GaussianMixtureDist(means=center, vars=covar, floor=floor)


def prior_dist(states: str) -> GaussianMixtureDist:
    """The reference's hardcoded two-object scene prior (klerg.py:34-44)."""
    base_states = "xyzrpw"
    base_duck = [-0.8, -0.8, -0.15, 3.6, 0.5, 0.0]
    base_ball = [0.6, 0.9, -0.15, 2.6, -0.5, 0.0]
    base_covar = [0.2, 0.2, 0.5, 0.2, 0.2, 0.5]
    duck = [base_duck[base_states.rfind(s)] if s in base_states else 0.0 for s in states]
    ball = [base_ball[base_states.rfind(s)] if s in base_states else 0.0 for s in states]
    covar = [base_covar[base_states.rfind(s)] if s in base_states else 1.0 for s in states]
    return GaussianMixtureDist(
        means=jnp.asarray([duck, ball], jnp.float32),
        vars=jnp.asarray([covar, covar], jnp.float32),
        floor=1e-5,
    )


class UniformDist(NamedTuple):
    """Constant density (parity: demo uniform_dist, klerg.py:762-778)."""

    dim: int = 2

    def pdf(self, samples):
        val = jnp.ones(samples.shape[0], jnp.float32)
        return val / jnp.sum(val) + 1e-5


@struct.dataclass
class ExplrDist:
    """Gaussian-mixture-from-pushed-points target used for fingerprint
    capture (parity: sensor_test_module.py ExplrDist :229-278): a ring of
    (mean, std) pairs; pdf = mean over pushed components; before any push it
    is uniform.
    """

    means: jax.Array  # (cap, d)
    stds: jax.Array  # (cap, d)
    size: jax.Array  # ()
    invert: bool = struct.field(pytree_node=False, default=False)

    @classmethod
    def create(cls, capacity: int, dim: int, invert: bool = False):
        return cls(
            means=jnp.zeros((capacity, dim), jnp.float32),
            stds=jnp.ones((capacity, dim), jnp.float32),
            size=jnp.zeros((), jnp.int32),
            invert=invert,
        )

    def push(self, mean, std) -> "ExplrDist":
        cap = self.means.shape[0]
        i = self.size % cap
        return self.replace(
            means=self.means.at[i].set(mean),
            stds=self.stds.at[i].set(std),
            size=jnp.minimum(self.size + 1, cap),
        )

    def pdf(self, samples):
        cap = self.means.shape[0]
        diff = samples[:, None, :] - self.means[None]  # (N, cap, d)
        comp = jnp.exp(-0.5 * jnp.sum(diff**2 / self.stds[None], axis=-1))
        mask = (jnp.arange(cap) < self.size).astype(jnp.float32)
        dist = jnp.sum(comp * mask[None, :], 1) / jnp.maximum(self.size, 1)
        if self.invert:
            # AvoidDist flip (memory_buffer.py:122-124)
            dist = -dist + jnp.max(dist) + jnp.min(dist)
        uniform = jnp.ones(samples.shape[0]) / samples.shape[0] + 1e-5
        return jnp.where(self.size > 0, dist, uniform)
