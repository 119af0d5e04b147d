"""Data-parallel training + sample-parallel inference via shard_map.

TPU replacement for the reference's DDP stack (§2.3 of SURVEY.md):
  - ``DDP(model, static_graph=True)`` + oneCCL all-reduce
    (trainer_module.py:223-224, trainer_ddp.py:26-29)  ->  per-shard grads +
    ``psum/pmean`` over a mesh axis, inserted by shard_map.
  - rank-coordinated batch draws from the shared replay buffer
    (vae_buffer.py:333-388)  ->  same-key global draw + disjoint slice per
    shard (see runtime.trainer.train_call).
  - The reference has no tensor/pipeline/sequence/expert parallelism
    (SURVEY.md §2.3); its only other scaling axis is the N-sample entropy
    decode, which maps to sample-parallel ``sharded_pdf`` here.

Everything is replicated except the batch dimension; on a real slice the
collectives ride ICI.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..runtime.trainer import TrainerStatics, train_call
from ..models import CVAE


def dp_train_call(statics: TrainerStatics, mesh: Mesh, params, opt_state, buf,
                  key, beta, gamma, weighted: bool = True, axis: str = "data",
                  deterministic: bool = False):
    """One trainer call data-parallel over ``axis``: each shard computes
    grads on batch_size/n rows of the same global batch; grads are pmean'd;
    updates are applied identically everywhere (replicated params)."""
    n = mesh.shape[axis]
    if statics.batch_size % n:
        raise ValueError(f"batch_size {statics.batch_size} not divisible by {n}")

    def shard_fn(params, opt_state, buf, key, beta, gamma):
        # NOTE: under shard_map's vma-aware autodiff (jax >= 0.8), the
        # cotangent of a replicated (P()) input is automatically psum'd
        # across the mesh — jax.grad inside the shard already returns the
        # SUM of per-shard grads. Dividing by n yields the global batch-mean
        # gradient (verified to 6e-7 against the full-batch grad; the
        # parallel test suite guards this semantics).
        params, opt_state, metrics = train_call(
            statics, params, opt_state, buf, key, beta, gamma,
            weighted=weighted,
            grad_transform=lambda g: jax.tree.map(lambda v: v / n, g),
            axis_name=axis,
            num_shards=n,
            deterministic=deterministic,
        )
        metrics = jax.tree.map(lambda m: jax.lax.pmean(m, axis), metrics)
        return params, opt_state, metrics

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(),
    )
    return fn(params, opt_state, buf, key, beta, gamma)


def sharded_pdf(model: CVAE, mesh: Mesh, params, mstate, samples,
                axis: str = "data"):
    """Uncertainty decode with the candidate samples sharded over the mesh —
    the multi-chip form of the reference's chunk decoder (vae.py:277-286),
    where the chunks are devices instead of CPU threads."""

    def shard_fn(params, mstate, samples):
        return model.apply(params, mstate, samples, method=CVAE.pdf)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
    )
    return fn(params, mstate, samples)
