"""Hyperparameter (beta/gamma) schedules.

Parity target: Trainer's schedule machinery (dist_modules/
trainer_module.py): fixed / manual-ramp / entropy-based selection :238-261,
the per-iteration ramp :451-460, and the entropy-based "grade" and "spread"
computation of pre_train_mp :487-545 (spread = mean normalized max-footprint
over uniform samples; grade = clamped inverse min model entropy with
exponent xi=4).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import traj_spread


class HyperState(NamedTuple):
    beta: jax.Array  # ()
    gamma: jax.Array  # ()
    iter: jax.Array  # () total optimizer iterations

    @classmethod
    def create(cls, beta0: float = 0.0, gamma0: float = 0.0):
        return cls(
            beta=jnp.asarray(beta0, jnp.float32),
            gamma=jnp.asarray(gamma0, jnp.float32),
            iter=jnp.zeros((), jnp.int32),
        )


def entropy_grade(pdf_vals, spread, xi: float = 4.0):
    """Grade from model pdf + coverage scalar (pre_train_mp :526-539):
    clamped inverse min normalized entropy with exponent xi."""
    ent = pdf_vals**spread
    ent = ent / jnp.maximum(jnp.max(ent), 1e-30)
    return jnp.clip(
        10.0 ** (-jnp.log10(jnp.maximum(jnp.min(ent), 1e-30)) - xi), None, 0.01
    )


def entropy_grade_spread(pdf_vals, all_x, x_mask, samples, explr_idx, std,
                         xi: float = 4.0):
    """(grade, spread) from model entropy + coverage (pre_train_mp
    :511-539). ``pdf_vals`` = model pdf at ``samples`` AFTER the update_dist
    reseed; ``all_x`` the replay buffer's visited poses with validity mask.
    """
    max_q = traj_spread(all_x, samples, explr_idx, std, traj_mask=x_mask)
    max_q = max_q / jnp.maximum(jnp.max(max_q), 1e-30)
    spread = jnp.mean(max_q)
    spread = jnp.where(jnp.sum(x_mask) > 0, spread, 0.0)
    return entropy_grade(pdf_vals, spread, xi), spread


def hyperparam_update(
    hs: HyperState,
    grade,
    spread,
    *,
    fixed_beta: bool = False,
    beta_manual_ramp: bool = False,
    fixed_gamma: bool = False,
    gamma_manual_ramp: bool = False,
    other_locs: bool = True,
    beta_start: float = 0.0,
    beta_end: float = 0.05,
    beta_warmup_steps: int = 1000,
    beta_warmup_epoch: int = 10,
    gamma_start: float = 0.0,
    gamma_end: float = 1.0,
    gamma_warmup_steps: int = 1000,
    gamma_warmup_epoch: int = 10,
) -> HyperState:
    """Select beta/gamma for the next trainer call (parity: __call__
    :376-382 entropy path; :451-460 manual ramps; fixed values :244-259)."""
    if fixed_beta:
        beta = jnp.asarray(beta_start, jnp.float32)
    elif not beta_manual_ramp:  # entropy-based (default)
        beta = jnp.asarray(grade, jnp.float32)
    else:
        d_beta = (beta_end - beta_start) / max(beta_warmup_steps, 1)
        ramp_iters = jnp.minimum(hs.iter // max(beta_warmup_epoch, 1), beta_warmup_steps)
        beta = beta_start + d_beta * ramp_iters

    if fixed_gamma or not other_locs:
        gamma = jnp.asarray(gamma_start if fixed_gamma else 0.0, jnp.float32)
    elif not gamma_manual_ramp:  # entropy-based (default)
        gamma = jnp.asarray(spread, jnp.float32)
    else:
        d_gamma = (gamma_end - gamma_start) / max(gamma_warmup_steps, 1)
        ramp_iters = jnp.minimum(hs.iter // max(gamma_warmup_epoch, 1), gamma_warmup_steps)
        gamma = gamma_start + d_gamma * ramp_iters

    return hs._replace(beta=beta, gamma=gamma)
