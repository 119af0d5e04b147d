import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealv_tpu.data import ReplayBuffer, TrajMemory


def _mk(capacity=10):
    return ReplayBuffer.create(capacity, s_dim=2, img_dim=(4, 4, 3))


class TestReplayBuffer:
    def test_push_and_get_last(self):
        buf = _mk()
        push = jax.jit(ReplayBuffer.push)
        for i in range(3):
            buf = push(buf, jnp.full(2, float(i)), jnp.full((4, 4, 3), float(i)))
        x, y, f = buf.get_last()
        np.testing.assert_allclose(x, [2.0, 2.0])
        assert int(buf.size) == 3 and int(buf.total) == 3

    def test_ring_wraparound(self):
        buf = _mk(capacity=4)
        for i in range(6):
            buf = buf.push(jnp.full(2, float(i)), jnp.zeros((4, 4, 3)))
        assert int(buf.size) == 4 and int(buf.total) == 6
        x, _, _ = buf.get_last()
        np.testing.assert_allclose(x, [5.0, 5.0])
        # oldest surviving rows are 2..5
        assert set(np.asarray(buf.x[:, 0]).tolist()) == {4.0, 5.0, 2.0, 3.0}

    def test_sample_only_valid(self):
        buf = _mk()
        for i in range(5):
            buf = buf.push(jnp.full(2, float(i)), jnp.zeros((4, 4, 3)))
        x, y, f, idx = buf.sample(jax.random.PRNGKey(0), 4)
        assert (np.asarray(idx) < 5).all()
        assert len(set(np.asarray(idx).tolist())) == 4  # without replacement

    def test_sample_overflow_wraps_to_valid(self):
        buf = _mk()
        buf = buf.push(jnp.ones(2), jnp.zeros((4, 4, 3)))
        buf = buf.push(2 * jnp.ones(2), jnp.zeros((4, 4, 3)))
        _, _, _, idx = buf.sample(jax.random.PRNGKey(0), 6)
        assert (np.asarray(idx) < 2).all()

    def test_weighted_sampling_prefers_recent_slots(self):
        buf = _mk(capacity=100)
        for i in range(100):
            buf = buf.push(jnp.full(2, float(i)), jnp.zeros((4, 4, 3)))
        counts = np.zeros(100)
        for s in range(200):
            idx = np.asarray(buf.sample_indices(jax.random.PRNGKey(s), 10, weighted=True))
            counts[idx] += 1
        # reference ramp: slot weight max(i, n/2); slots >=50 get ~2x more
        assert counts[75:].mean() > counts[:25].mean() * 1.3

    def test_weighted_sampling_prefers_recent_after_wrap(self):
        # After the ring wraps, the newest pushes live at slots < pos; the
        # recency ramp must follow push age, not slot index
        # (vae_buffer.py:318 weights chronological order).
        buf = _mk(capacity=100)
        for i in range(150):  # slots 0..49 now hold pushes 100..149 (newest)
            buf = buf.push(jnp.full(2, float(i)), jnp.zeros((4, 4, 3)))
        assert int(buf.pos) == 50
        counts = np.zeros(100)
        for s in range(200):
            idx = np.asarray(buf.sample_indices(jax.random.PRNGKey(s), 10, weighted=True))
            counts[idx] += 1
        newest = counts[25:50].mean()   # pushes 125..149 (rank 75..99)
        oldest = counts[50:75].mean()   # pushes 50..74 (rank 0..24, clamped n/2)
        assert newest > oldest * 1.3

    def test_hyperparam_ring(self):
        buf = _mk()
        buf = buf.update_hyperparams(3, 0.01, 0.5)
        buf = buf.update_hyperparams(4, 0.02, 0.7)
        ind, beta, gamma = buf.get_hyperparams()
        assert int(ind) == 4
        np.testing.assert_allclose(float(beta), 0.015, rtol=1e-5)
        np.testing.assert_allclose(float(gamma), 0.6, rtol=1e-5)

    def test_hyperparam_nan_dropped(self):
        buf = _mk()
        buf = buf.update_hyperparams(1, 0.01, 0.5)
        buf = buf.update_hyperparams(2, jnp.nan, 0.9)
        ind, beta, gamma = buf.get_hyperparams()
        assert int(ind) == 1  # nan push dropped entirely
        np.testing.assert_allclose(float(beta), 0.01, rtol=1e-5)

    def test_get_xi(self, rng):
        buf = _mk()
        for i in range(4):
            buf = buf.push(jnp.zeros(2), jnp.array(rng.uniform(0, 1, (4, 4, 3)), jnp.float32))
        xi = float(buf.get_xi())
        assert 0 < xi <= 10.0


class TestTrajMemory:
    def test_push_get_recent(self):
        mem = TrajMemory.create(5, 3)
        for i in range(3):
            mem = mem.push(jnp.full(3, float(i)))
        recent, mask = mem.get_recent(2)
        np.testing.assert_allclose(recent[:, 0], [2.0, 1.0])
        np.testing.assert_allclose(mask, [1.0, 1.0])

    def test_get_recent_mask_when_short(self):
        mem = TrajMemory.create(5, 3)
        mem = mem.push(jnp.ones(3))
        recent, mask = mem.get_recent(4)
        np.testing.assert_allclose(mask, [1.0, 0.0, 0.0, 0.0])

    def test_sample_masks_invalid(self):
        mem = TrajMemory.create(8, 2)
        for i in range(3):
            mem = mem.push(jnp.full(2, float(i + 1)))
        pts, mask = mem.sample(jax.random.PRNGKey(0), 6)
        assert mask.sum() == 3
        valid = np.asarray(pts)[np.asarray(mask) > 0]
        assert set(valid[:, 0].tolist()) == {1.0, 2.0, 3.0}

    def test_get_all(self):
        mem = TrajMemory.create(4, 2)
        for i in range(6):
            mem = mem.push(jnp.full(2, float(i)))
        buf, mask = mem.get_all()
        np.testing.assert_allclose(mask, 1.0)


class TestBf16ImageRing:
    """bf16 image storage (replay.py create img_dtype): halves the ring's
    HBM footprint and gather traffic; training quality must be unaffected
    (camera images are 8-bit at the source; bf16 keeps ~8 mantissa bits)."""

    def _train(self, img_dtype):
        from ealv_tpu.data.replay import ReplayBuffer
        from ealv_tpu.models import CVAE
        from ealv_tpu.runtime.trainer import TrainerStatics, train_call
        model = CVAE(img_dim=(16, 16, 3), z_dim=4, s_dim=2,
                     hidden_dim=(32, 16), cnn_kernels=(3,), cnn_strides=(2,),
                     cnn_channels=(4,))
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key}, jnp.zeros((1, 2)),
                            jnp.zeros((1, 16, 16, 3)), train=False)
        buf = ReplayBuffer.create(32, 2, (16, 16, 3), img_dtype=img_dtype)
        for i in range(20):
            kk = jax.random.fold_in(key, i)
            buf = buf.push(jax.random.uniform(kk, (2,)),
                           jax.random.uniform(jax.random.fold_in(kk, 1),
                                              (16, 16, 3)))
        tr = TrainerStatics(model=model, batch_size=8, num_learning_opt=6)
        opt_state = tr.make_optimizer().init(params)
        params, opt_state, m = train_call(tr, params, opt_state, buf,
                                          jax.random.fold_in(key, 99),
                                          0.001, 0.1)
        return np.asarray(m["loss"])

    def test_dtype_stored(self):
        from ealv_tpu.data.replay import ReplayBuffer
        buf = ReplayBuffer.create(4, 2, (8, 8, 3), img_dtype=jnp.bfloat16)
        buf = buf.push(jnp.zeros(2), jnp.full((8, 8, 3), 0.123456))
        assert buf.y.dtype == jnp.bfloat16
        assert buf.x.dtype == jnp.float32  # poses stay f32
        # stored value is the bf16 rounding of the input
        assert abs(float(buf.y[0, 0, 0, 0]) - 0.123456) < 1e-3

    @pytest.mark.slow
    def test_training_quality_unaffected(self):
        l32 = self._train(jnp.float32)
        l16 = self._train(jnp.bfloat16)
        # identical keys, identical data modulo bf16 rounding of the images:
        # the loss trajectories must track closely
        np.testing.assert_allclose(l16, l32, rtol=0.05, atol=0.05)
