"""Latent-space distances between diagonal Gaussians.

Parity target: get_dist (dist_modules/fingerprint_module.py:44-70) — the
four fingerprint matching metrics: L2 on means, negative mean log-prob,
KL(N1 || N2), and the Bhattacharyya distance. Vectorized over leading dims.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_LOG_SQRT_2PI = math.log(math.sqrt(2.0 * math.pi))


def latent_distance(method: str, z1_mu, z1_logvar, z2_mu, z2_logvar):
    """Distance between N(z1_mu, diag exp(z1_logvar)) and N(z2_mu, ...).

    Reduces over the last axis; broadcasts over leading axes. ``method`` is
    matched by substring like the reference ('L2', 'logprob', 'KL', 'BC').
    """
    diff = z1_mu - z2_mu
    if "L2" in method:
        return jnp.sqrt(jnp.sum(diff**2, axis=tuple(range(1, diff.ndim))))
    if "logprob" in method:
        # -mean log N(z2_mu | z1_mu, std=exp(z1_logvar)) — note the reference
        # passes exp(logvar) as the Normal's SCALE (fingerprint_module.py:55)
        log_scale = z1_logvar
        var = jnp.exp(z1_logvar) ** 2
        log_prob = -(diff**2) / (2 * var) - log_scale - _LOG_SQRT_2PI
        return -jnp.mean(log_prob, axis=-1)
    z1_var = jnp.exp(z1_logvar)
    z2_var = jnp.exp(z2_logvar)
    if "KL" in method:
        mu_diff = jnp.sum((z1_var + jnp.square(diff)) / (2 * z2_var), axis=-1)
        var_diff = jnp.sum(z2_logvar / 2 - z1_logvar / 2, axis=-1)
        return var_diff + mu_diff - 0.5 * diff.shape[-1]
    if "BC" in method:
        mu_diff = jnp.sum(jnp.square(diff) / (z1_var + z2_var), axis=-1)
        var_prod = jnp.sum(
            jnp.log((z1_var + z2_var) / 2) - z1_logvar / 2 - z2_logvar / 2, axis=-1
        )
        return 0.25 * mu_diff + 0.5 * var_prod
    raise ValueError(f"requested method {method!r} not defined")
