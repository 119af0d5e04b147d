"""CVAE training losses.

Parity target: trainer get_loss (franka_test/scripts/dist_modules/
trainer_module.py:44-54) — Gaussian NLL with std = exp(y_logvar) (note: the
reference's ``var = exp(logvar)^2`` treats the head as a log-STD; we keep
that convention for parity) plus the analytic KL to a unit Gaussian, and the
full weighted objective of Trainer.__call__ :403-421
(RC + beta*KL + force + gamma_weight*gamma*cross-decode).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_LOG_SQRT_2PI = math.log(math.sqrt(2.0 * math.pi))


def gaussian_nll(y, y_pred, y_logvar):
    """-mean log N(y | y_pred, exp(y_logvar)^2), y_logvar broadcast to y.

    ``y_pred`` may arrive in the model's compute dtype (bf16): the upcast
    happens elementwise inside this fused reduce, so the accumulation is
    f32 without a materialized f32 copy of the prediction."""
    y_logvar = jnp.broadcast_to(
        y_logvar.reshape(y_logvar.shape[0], *([1] * (y.ndim - 2)), -1), y.shape
    ) if y_logvar.ndim != y.ndim else y_logvar
    y_pred = y_pred.astype(jnp.float32)
    y = y.astype(jnp.float32)
    var = jnp.exp(y_logvar) ** 2
    log_prob = -jnp.square(y - y_pred) / (2.0 * var) - y_logvar - _LOG_SQRT_2PI
    return -jnp.mean(log_prob)


def kl_divergence(z_mu, z_logvar):
    """-mean_B 0.5 sum_z (1 + logvar - mu^2 - exp(logvar))."""
    return -jnp.mean(0.5 * jnp.sum(1.0 + z_logvar - z_mu**2 - jnp.exp(z_logvar), axis=1))


def cvae_loss(
    out: dict,
    y,
    force=None,
    y2=None,
    force2=None,
    beta: float = 0.0,
    gamma: float = 0.0,
    gamma_weight: float = 0.1,
    learn_force: bool = False,
    other_locs: bool = False,
):
    """Full objective (parity: trainer_module.py:403-421). Returns
    (loss, metrics dict)."""
    rc = gaussian_nll(y, out["img_pred"], out["img_logvar"])
    kl = kl_divergence(out["z_mu"], out["z_logvar"])
    loss = rc + beta * kl
    metrics = {"rc": rc, "kl": kl}

    if learn_force:
        f_loss = gaussian_nll(force, out["force_pred"], out["force_logvar"])
        loss = loss + f_loss
        metrics["force"] = f_loss

    if other_locs:
        rc_o = gaussian_nll(y2, out["img_pred_decode"], out["img_logvar_decode"])
        other = gamma * rc_o
        if learn_force:
            f_o = gaussian_nll(force2, out["force_pred_decode"], out["force_logvar_decode"])
            other = other + gamma * f_o
        loss = loss + other * gamma_weight
        metrics["rc_other"] = rc_o

    metrics["loss"] = loss
    return loss, metrics
