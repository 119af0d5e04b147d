"""Trainer call — the learning half of the explore+learn loop.

Parity target: Trainer.__call__ (dist_modules/trainer_module.py:374-464):
``num_learning_opt`` optimizer steps per call, weighted batch sampling,
Gaussian NLL + beta*KL + force + gamma_weight*gamma*cross-decode loss, and
latent-activity diagnostics (:441-449).

TPU-first: the reference splits each batch across N DDP processes with
oneCCL all-reduce and coordinates their draws through a shared index ring
(vae_buffer.py:333-388). Here the 25-step call is one lax.scan'd jitted
program; data parallelism (ealv_tpu.parallel) shards the batch axis over a
mesh with psum'd grads — same math, no rank choreography.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..models import CVAE, cvae_loss
from ..data.replay import ReplayBuffer
from ..ops.pallas_adam import pallas_adam, adam_apply


@dataclasses.dataclass(frozen=True)
class TrainerStatics:
    """Static half of the trainer (model graph + optimizer + sizes)."""

    model: CVAE
    batch_size: int = 64
    num_learning_opt: int = 25
    gamma_weight: float = 0.1
    other_locs: bool = True
    lr: float = 1e-3
    # fused single-pass Adam (ops/pallas_adam.py) — bit-identical update
    # math to optax.adam (test_kernels.py::TestPallasAdam). Measured on the
    # 25-step production trainer scan (TPU v5e): 64.3 ms fused vs 58.7 ms
    # optax — XLA's own multiply-add fusion schedule beats the per-leaf
    # pallas_call launches inside a scan carry, so the XLA path stays the
    # default (the kernel wins only for standalone multi-MB updates).
    fused_adam: bool = False
    # lax.scan unroll factor for the SGD loop. xprof shows ~0.35 ms/SGD
    # step of while-loop boundary self-time at this model size; unrolling
    # amortizes it over `unroll` bodies per loop trip.
    scan_unroll: int = 1

    def make_optimizer(self):
        if self.fused_adam:
            return pallas_adam(self.lr)
        return optax.adam(self.lr)


def train_call(
    statics: TrainerStatics,
    params,
    opt_state,
    buf: ReplayBuffer,
    key,
    beta,
    gamma,
    weighted: bool = True,
    grad_transform=None,
    axis_name: str | None = None,
    num_shards: int = 1,
    deterministic: bool = False,
):
    """One trainer call: num_learning_opt jitted SGD steps.

    ``grad_transform(grads) -> grads`` hooks cross-device reduction
    (e.g. ``lambda g: jax.lax.pmean(g, 'data')`` under shard_map).

    When ``axis_name`` is set (running inside shard_map over a data axis),
    every shard draws the SAME global index batch (same key) and consumes
    its own disjoint slice — the TPU equivalent of the reference's rank-0
    pre-drawn shared index matrix (vae_buffer.py:333-388), with the
    coordination done by construction instead of polling.

    Returns (params, opt_state, metrics) with leading dim num_learning_opt.
    """
    model = statics.model
    opt = statics.make_optimizer()
    bpp = statics.batch_size // num_shards  # batch per shard (utils.py:273-279)

    def shard_slice(idx):
        if axis_name is None:
            return idx
        me = jax.lax.axis_index(axis_name)
        return jax.lax.dynamic_slice(idx, (me * bpp,), (bpp,))

    def one_step(carry, k):
        params, opt_state = carry
        k_b, k_b2, k_r = jax.random.split(k, 3)
        idx = shard_slice(buf.sample_indices(k_b, statics.batch_size, weighted=weighted))
        x, y, force = buf.x[idx], buf.y[idx], buf.force[idx]
        force_in = force if model.learn_force else None
        if statics.other_locs:
            idx2 = shard_slice(
                buf.sample_indices(k_b2, statics.batch_size, weighted=False)
            )
            x2, y2, force2 = buf.x[idx2], buf.y[idx2], buf.force[idx2]
            x_dec = (x2 - x) if model.dx else x2
        else:
            x2 = y2 = force2 = x_dec = None

        def loss_fn(p):
            out = model.apply(
                p, x, y, force=force_in, x_decode=x_dec,
                train=not deterministic,
                rngs={"reparam": k_r} if not deterministic else None,
            )
            loss, m = cvae_loss(
                out, y, force=force, y2=y2, force2=force2,
                beta=beta, gamma=gamma, gamma_weight=statics.gamma_weight,
                learn_force=model.learn_force, other_locs=statics.other_locs,
            )
            # aux carries only the small latent tensors the diagnostics
            # need — returning the full `out` dict would force the VJP to
            # keep the (2B, H, W, C) image predictions alive in HBM
            return loss, (m, {"z_mu": out["z_mu"], "z_logvar": out["z_logvar"]})

        (loss, (m, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        if grad_transform is not None:
            grads = grad_transform(grads)
        if statics.fused_adam:
            # direct in-place form: skips the optax update/apply_updates
            # round-trip (an extra full pass over the parameters)
            params, opt_state = adam_apply(params, opt_state, grads, statics.lr)
        else:
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)

        # latent diagnostics (trainer_module.py:441-449)
        thr = 0.01
        vars_of_means = jnp.var(out["z_mu"], axis=0)
        means_of_vars = jnp.mean(jnp.exp(out["z_logvar"]), axis=0)
        metrics = {
            "loss": loss,
            "rc": m["rc"],
            "kl": m["kl"],
            "z_activity": jnp.sum(vars_of_means),
            "active_units": jnp.sum(vars_of_means > thr),
            "active_units_vars": jnp.sum(means_of_vars < thr),
        }
        if statics.other_locs:
            metrics["rc_other"] = m["rc_other"]
        if model.learn_force:
            metrics["force"] = m["force"]
        return (params, opt_state), metrics

    keys = jax.random.split(key, statics.num_learning_opt)
    (params, opt_state), metrics = jax.lax.scan(
        one_step, (params, opt_state), keys, unroll=statics.scan_unroll)
    return params, opt_state, metrics
