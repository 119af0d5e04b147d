"""Device-resident replay + trajectory ring buffers.

Parity targets:
  - ReplayBufferTorch (franka_test/scripts/vae/vae_buffer.py:141-414):
    preallocated x/y/force rings + per-sample image variance (push :289-299),
    recency-weighted or uniform sampling without replacement (sample
    :315-331), the beta/gamma hyperparameter ring (update_hyperparams
    :186-208, get_hyperparams :219-229), get_xi :210-217, get_last :400,
    get_all_x :407.
  - MemoryBuffer_torch (control_torch/memory_buffer.py:38-92): visited-state
    ring with sample/get_recent/get_all.

TPU-first design: the reference shares these buffers across processes with
torch shared memory and coordinates DDP ranks through pre-drawn index
matrices (vae_buffer.py:333-388). On TPU there is one device program, so the
buffer is just a pytree that lives in HBM; "sharing" is by construction, the
rank-coordination machinery disappears, and sharded trainers draw per-shard
batches from the same replicated ring. Dynamic sizes become fixed capacity +
validity masks; without-replacement sampling uses the Gumbel top-k trick
(one fused op instead of torch.multinomial).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class ReplayBuffer(NamedTuple):
    x: jax.Array  # (cap, s_dim)
    y: jax.Array  # (cap, H, W, C)
    force: jax.Array  # (cap, 1)
    y_var: jax.Array  # (cap,) per-sample image variance
    pos: jax.Array  # () int32 ring head
    size: jax.Array  # () int32 valid rows
    total: jax.Array  # () int32 total pushes (explr_step)
    beta: jax.Array  # (beta_cap,) hyperparam ring ("grade")
    gamma: jax.Array  # (beta_cap,) ("spread")
    beta_pos: jax.Array  # () int32
    beta_size: jax.Array  # () int32
    explr_ind: jax.Array  # () int32

    # ---------- constructors ----------
    @classmethod
    def create(cls, capacity: int, s_dim: int, img_dim, beta_capacity: int = 25,
               learn_force: bool = True, img_dtype=jnp.float32):
        """``img_dtype=bfloat16`` halves the image ring's HBM footprint and
        the per-step gather traffic; camera images are 8-bit at the source,
        so bf16's 8 mantissa bits lose <0.4% — pose/force/weights stay f32."""
        h, w, c = img_dim
        zero = jnp.zeros((), jnp.int32)
        return cls(
            x=jnp.zeros((capacity, s_dim), jnp.float32),
            y=jnp.zeros((capacity, h, w, c), img_dtype),
            force=jnp.zeros((capacity, 1), jnp.float32),
            y_var=jnp.zeros((capacity,), jnp.float32),
            pos=zero,
            size=zero,
            total=zero,
            beta=jnp.zeros((beta_capacity,), jnp.float32),
            gamma=jnp.zeros((beta_capacity,), jnp.float32),
            beta_pos=zero,
            beta_size=zero,
            explr_ind=zero,
        )

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    # ---------- mutation (functional; XLA performs the ring update in
    # place under jit — measured 0.07 ms for a 1.2 GB buffer without
    # donation. Do NOT use donate_argnums: the axon TPU backend
    # invalidates sibling argument buffers on donated calls). ----------
    def push(self, x, y, force=None) -> "ReplayBuffer":
        i = self.pos
        cap = self.capacity
        f = force if force is not None else jnp.zeros(1, jnp.float32)
        return self._replace(
            x=self.x.at[i].set(x),
            y=self.y.at[i].set(y.astype(self.y.dtype)),
            force=self.force.at[i].set(f),
            y_var=self.y_var.at[i].set(jnp.var(y)),
            pos=(i + 1) % cap,
            size=jnp.minimum(self.size + 1, cap),
            total=self.total + 1,
        )

    def update_hyperparams(self, explr_ind, grade, spread) -> "ReplayBuffer":
        """Push (grade->beta, spread->gamma); nan/inf pushes are dropped
        (parity: vae_buffer.py:186-208)."""
        ok = jnp.isfinite(grade) & jnp.isfinite(spread)
        i = self.beta_pos
        cap = self.beta.shape[0]
        return self._replace(
            beta=jnp.where(ok, self.beta.at[i].set(grade), self.beta),
            gamma=jnp.where(ok, self.gamma.at[i].set(spread), self.gamma),
            beta_pos=jnp.where(ok, (i + 1) % cap, i),
            beta_size=jnp.where(ok, jnp.minimum(self.beta_size + 1, cap), self.beta_size),
            explr_ind=jnp.where(ok, jnp.asarray(explr_ind, jnp.int32), self.explr_ind),
        )

    # ---------- queries ----------
    def get_hyperparams(self):
        """(explr_ind, mean beta, mean gamma) over the valid ring
        (parity: :219-229)."""
        n = jnp.maximum(self.beta_size, 1)
        mask = jnp.arange(self.beta.shape[0]) < self.beta_size
        beta = jnp.sum(jnp.where(mask, self.beta, 0.0)) / n
        gamma = jnp.sum(jnp.where(mask, self.gamma, 0.0)) / n
        return self.explr_ind, beta, gamma

    def get_xi(self):
        """mean/max of clamped image variances * 10 (parity: :210-217)."""
        mask = jnp.arange(self.capacity) < self.size
        v = jnp.clip(self.y_var, jnp.exp(-10.0), None)
        vmax = jnp.max(jnp.where(mask, v, 0.0))
        vmean = jnp.sum(jnp.where(mask, v, 0.0)) / jnp.maximum(self.size, 1)
        return vmean / jnp.maximum(vmax, 1e-30) * 10.0

    def valid_mask(self):
        return (jnp.arange(self.capacity) < self.size).astype(jnp.float32)

    def _weights_log(self, weighted: bool):
        """Log sampling weights over slots. Weighted mode reproduces the
        reference's recency ramp clamp(arange(n), min=n/2) over CHRONOLOGICAL
        order (vae_buffer.py:318) — computed from each slot's age relative to
        the ring head so the ramp stays correct after the ring wraps (slot
        order and push order diverge once pos cycles past capacity)."""
        cap = self.capacity
        slots = jnp.arange(cap, dtype=jnp.int32)
        n = self.size.astype(jnp.float32)
        age = jnp.mod(self.pos - 1 - slots, cap).astype(jnp.float32)
        rank = n - 1.0 - age  # 0 = oldest valid push, n-1 = newest
        valid = rank >= 0.0
        if weighted:
            w = jnp.clip(rank, n / 2.0, None)
        else:
            w = jnp.ones(cap)
        w = jnp.where(valid, w, 0.0)
        return jnp.log(jnp.maximum(w, 1e-30)) + jnp.where(valid, 0.0, -1e30)

    def sample_indices(self, key, batch_size: int, weighted: bool = False):
        """Without-replacement weighted sampling via Gumbel top-k
        (replaces torch.multinomial, vae_buffer.py:322)."""
        logw = self._weights_log(weighted)
        g = jax.random.gumbel(key, (self.capacity,))
        _, idx = jax.lax.top_k(logw + g, batch_size)
        # batch > size: wrap overflow draws onto the valid prefix (the
        # reference would raise in torch.multinomial; fixed shapes need a
        # total function, and repeating valid rows is the sane fallback)
        idx = jnp.take(idx, jnp.arange(batch_size) % jnp.maximum(self.size, 1))
        return idx

    def sample(self, key, batch_size: int, weighted: bool = False):
        idx = self.sample_indices(key, batch_size, weighted)
        return self.x[idx], self.y[idx], self.force[idx], idx

    def get_last(self):
        i = (self.pos - 1) % self.capacity
        return self.x[i], self.y[i], self.force[i]

    def get_all_x(self):
        """(x (cap, s_dim), validity mask (cap,)) — fixed-shape stand-in for
        the reference's variable-length get_all_x (:407-411)."""
        return self.x, self.valid_mask()


class TrajMemory(NamedTuple):
    """Visited-state ring for the planner's trajectory history
    (parity: MemoryBuffer_torch, memory_buffer.py:38-92)."""

    buf: jax.Array  # (cap, n_states)
    pos: jax.Array  # ()
    size: jax.Array  # ()

    @classmethod
    def create(cls, capacity: int, state_dim: int):
        return cls(
            buf=jnp.zeros((capacity, state_dim), jnp.float32),
            pos=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    @property
    def capacity(self) -> int:
        return self.buf.shape[0]

    def push(self, state) -> "TrajMemory":
        i = self.pos
        return self._replace(
            buf=self.buf.at[i].set(state),
            pos=(i + 1) % self.capacity,
            size=jnp.minimum(self.size + 1, self.capacity),
        )

    def sample(self, key, batch_size: int):
        """Uniform without-replacement draw of up to batch_size valid rows.

        Fixed-shape: returns (states (batch_size, n), mask (batch_size,));
        when fewer than batch_size rows are valid the mask marks only the
        distinct valid draws (parity with torch randperm truncation,
        memory_buffer.py:52-63).
        """
        cap = self.capacity
        slots = jnp.arange(cap)
        valid = slots < self.size
        logw = jnp.where(valid, 0.0, -1e30)
        g = jax.random.gumbel(key, (cap,))
        _, idx = jax.lax.top_k(logw + g, batch_size)
        mask = (jnp.arange(batch_size) < self.size).astype(jnp.float32)
        return self.buf[idx], mask

    def get_recent(self, k: int):
        """Last k pushed states, fixed shape (k, n) + mask."""
        idx = (self.pos - 1 - jnp.arange(k)) % self.capacity
        mask = (jnp.arange(k) < self.size).astype(jnp.float32)
        return self.buf[idx], mask

    def get_all(self):
        return self.buf, (jnp.arange(self.capacity) < self.size).astype(jnp.float32)
