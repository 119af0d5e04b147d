"""Fused single-pass Adam update as a Pallas TPU kernel.

Motivation (measured, see ARCHITECTURE.md): the online-learning tick is
dominated by the 25-step trainer scan, and each SGD step is HBM-bound —
XLA schedules the Adam update as several multiply_add fusions plus while-
loop carry copies of the parameter/moment buffers (~0.7 ms/step of the
~2.2 ms step at the 4.3M-param flagship size). This kernel performs the
whole update

    m <- b1*m + (1-b1)*g
    v <- b2*v + (1-b2)*g^2
    p <- p - lr * (m/(1-b1^t)) / (sqrt(v/(1-b2^t)) + eps)

in ONE pass over (p, m, v, g) with ``input_output_aliases`` so p/m/v are
updated in place: the minimum possible traffic (4 reads + 3 writes of the
parameter bytes) and no carry copies.

Semantics match ``optax.adam(lr)`` (scale_by_adam with eps_root=0) —
verified bitwise-close by tests/test_kernels.py. The per-leaf wrapper
applies the kernel to large leaves and inline jnp math to small ones
(kernel launch overhead would dominate below ~64k elements).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_BLOCK_ROWS = 1024  # (1024, 128) f32 blocks = 512 KB/operand in VMEM
_MIN_KERNEL_SIZE = 64 * 1024  # below this, inline jnp math is cheaper


def _adam_kernel(scal_ref, p_ref, m_ref, v_ref, g_ref,
                 p_out, m_out, v_out, *, b1: float, b2: float, eps: float):
    lr = scal_ref[0]
    c1 = scal_ref[1]  # 1 - b1^t
    c2 = scal_ref[2]  # 1 - b2^t
    g = g_ref[:]
    m = b1 * m_ref[:] + (1.0 - b1) * g
    v = b2 * v_ref[:] + (1.0 - b2) * g * g
    mhat = m / c1
    vhat = v / c2
    p_out[:] = p_ref[:] - lr * mhat / (jnp.sqrt(vhat) + eps)
    m_out[:] = m
    v_out[:] = v


@functools.partial(jax.jit, static_argnames=("b1", "b2", "eps", "interpret"))
def adam_update_flat(p, m, v, g, lr, count,
                     b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                     interpret: bool = False):
    """One fused Adam update on a flat f32 vector. Returns (p, m, v).

    ``count`` is the post-increment step (optax convention: first update
    uses count=1)."""
    n = p.shape[0]
    if n % _LANE:
        raise ValueError(f"adam_update_flat needs size % {_LANE} == 0, got {n}")

    def prep(a):
        # reshape only — no pad, so input_output_aliases really aliases the
        # caller's buffer (a pad would materialize a copy and defeat the
        # in-place update)
        return a.reshape(-1, _LANE)

    cf = count.astype(jnp.float32)
    scal = jnp.stack([
        jnp.asarray(lr, jnp.float32),
        1.0 - b1 ** cf,
        1.0 - b2 ** cf,
    ])

    rows = n // _LANE
    grid = (pl.cdiv(rows, _BLOCK_ROWS),)  # ragged edge handled by pallas
    bspec = pl.BlockSpec((_BLOCK_ROWS, _LANE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((rows, _LANE), jnp.float32)
    p2, m2, v2 = pl.pallas_call(
        functools.partial(_adam_kernel, b1=b1, b2=b2, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            bspec, bspec, bspec, bspec,
        ],
        out_specs=(bspec, bspec, bspec),
        out_shape=(out_shape, out_shape, out_shape),
        input_output_aliases={1: 0, 2: 1, 3: 2},  # p, m, v in place
        interpret=interpret,
    )(scal, prep(p), prep(m), prep(v), prep(g))
    return (p2.reshape(-1)[:n], m2.reshape(-1)[:n], v2.reshape(-1)[:n])


class PallasAdamState(NamedTuple):
    count: jax.Array  # () int32
    mu: dict  # pytree like params
    nu: dict  # pytree like params


def _inline_adam(p, m, v, g, lr, c1, c2, b1, b2, eps):
    m = b1 * m + (1.0 - b1) * g
    v = b2 * v + (1.0 - b2) * jnp.square(g)
    p = p - lr * (m / c1) / (jnp.sqrt(v / c2) + eps)
    return p, m, v


def adam_init(params) -> PallasAdamState:
    zeros = jax.tree.map(lambda x: jnp.zeros_like(x, jnp.float32), params)
    return PallasAdamState(
        count=jnp.zeros((), jnp.int32),
        mu=zeros,
        nu=jax.tree.map(jnp.copy, zeros),
    )


def adam_apply(params, state: PallasAdamState, grads, lr,
               b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
               min_kernel_size: int = _MIN_KERNEL_SIZE,
               force_kernel: bool | None = None):
    """(params, state, grads) -> (new_params, new_state), fused in place.

    The direct form the trainer uses: unlike the optax update/apply_updates
    contract (which forces an extra diff + add pass over all parameters),
    this applies the update inside the kernel — one pass total."""
    count = state.count + 1
    cf = count.astype(jnp.float32)
    c1 = 1.0 - b1 ** cf
    c2 = 1.0 - b2 ** cf
    lr_arr = jnp.asarray(lr, jnp.float32)

    p_leaves, treedef = jax.tree.flatten(params)
    m_leaves = treedef.flatten_up_to(state.mu)
    v_leaves = treedef.flatten_up_to(state.nu)
    g_leaves = treedef.flatten_up_to(grads)

    use_kernel = (jax.default_backend() == "tpu"
                  if force_kernel is None else force_kernel)
    new_p, new_m, new_v = [], [], []
    for p, m, v, g in zip(p_leaves, m_leaves, v_leaves, g_leaves):
        if (use_kernel and p.size >= min_kernel_size
                and p.size % _LANE == 0 and p.dtype == jnp.float32):
            pf, mf, vf = adam_update_flat(
                p.reshape(-1), m.reshape(-1), v.reshape(-1),
                g.reshape(-1).astype(jnp.float32),
                lr_arr, count, b1=b1, b2=b2, eps=eps,
            )
            new_p.append(pf.reshape(p.shape))
            new_m.append(mf.reshape(p.shape))
            new_v.append(vf.reshape(p.shape))
        else:
            pn, mn, vn = _inline_adam(p, m, v, g.astype(p.dtype),
                                      lr_arr, c1, c2, b1, b2, eps)
            new_p.append(pn)
            new_m.append(mn)
            new_v.append(vn)

    return (
        jax.tree.unflatten(treedef, new_p),
        PallasAdamState(
            count=count,
            mu=jax.tree.unflatten(treedef, new_m),
            nu=jax.tree.unflatten(treedef, new_v),
        ),
    )


def pallas_adam(lr: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8, min_kernel_size: int = _MIN_KERNEL_SIZE):
    """optax.GradientTransformation wrapper over ``adam_apply`` (drop-in for
    ``optax.adam(lr)``, same update math). NOTE: the optax contract returns
    ``updates`` that the caller adds back, which costs an extra pass over
    the parameters — performance-critical paths should call ``adam_apply``
    directly (runtime/trainer.py does)."""
    import optax

    def init(params):
        return adam_init(params)

    def update(grads, state, params):
        if params is None:
            raise ValueError("pallas_adam requires params")
        new_params, new_state = adam_apply(
            params, state, grads, lr, b1=b1, b2=b2, eps=eps,
            min_kernel_size=min_kernel_size,
        )
        updates = jax.tree.map(lambda pn, po: pn - po, new_params, params)
        return updates, new_state

    return optax.GradientTransformation(init, update)
