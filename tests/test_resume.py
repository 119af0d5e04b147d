"""Mid-run checkpoint/resume: bit-identical continuation.

The property (SURVEY.md §5 improvement over the reference, whose snapshots
are model+optimizer only, trainer_module.py:613-672): checkpointing the
WHOLE ExperimentState pytree between fused chunks makes a killed run
resumable with an EXACTLY identical continuation — the fused path is a
pure function of state (all randomness lives in es.key), so replaying the
remaining chunks from the restored state reproduces the uninterrupted run
leaf for leaf. scripts/resume_study.py demonstrates the same property
end-to-end with a real SIGKILL at flagship scale (repro: `resume`).
"""

import jax
import numpy as np
import pytest

from ealv_tpu.runtime import Experiment
from ealv_tpu.runtime.checkpoint import (latest_checkpoint, load_checkpoint,
                                         save_checkpoint)
from ealv_tpu.utils.config import ExperimentConfig


def tiny_experiment(**kw):
    cfg = ExperimentConfig(
        states="xyw", image_dim=(24, 24, 3),
        cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(8, 8),
        hidden_dim=(64, 32), z_dim=8,
        num_target_samples=128, num_traj_samples=64,
        traj_buffer_capacity=256, buffer_capacity=256,
        batch_size=8, num_learning_opt=2, **kw,
    )
    return Experiment(cfg, train_calls_per_tick=1)


CHUNK = 5

# two full Experiment jit compiles -> minutes on a contended box
pytestmark = pytest.mark.slow


class TestKillResume:
    def test_resume_is_bit_identical(self, tmp_path):
        # control: 4 chunks straight through
        exp = tiny_experiment()
        run = jax.jit(lambda s: exp.run_chunk(s, CHUNK)[0])
        es = exp.init(seed=0)
        for _ in range(2):
            es = run(es)
        ck = save_checkpoint(str(tmp_path / "ckpts"), es,
                             step=int(es.explr_step))
        for _ in range(2):
            es = run(es)
        final_a = jax.tree.leaves(jax.device_get(es))

        # "killed" run: a FRESH Experiment in-process (new jit cache, new
        # init) restores the mid-run checkpoint and replays the remainder
        exp2 = tiny_experiment()
        run2 = jax.jit(lambda s: exp2.run_chunk(s, CHUNK)[0])
        es2 = exp2.init(seed=0)
        assert latest_checkpoint(str(tmp_path / "ckpts")) == ck
        es2 = load_checkpoint(ck, es2)
        assert int(es2.explr_step) == 2 * CHUNK
        for _ in range(2):
            es2 = run2(es2)
        final_b = jax.tree.leaves(jax.device_get(es2))

        assert len(final_a) == len(final_b)
        for a, b in zip(final_a, final_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_checkpoint_roundtrip_preserves_rng(self, tmp_path):
        # the RNG key is state: a restored run must NOT re-seed
        exp = tiny_experiment()
        es = exp.init(seed=3)
        es = jax.jit(lambda s: exp.run_chunk(s, CHUNK)[0])(es)
        ck = save_checkpoint(str(tmp_path / "c"), es, step=int(es.explr_step))
        es2 = load_checkpoint(ck, exp.init(seed=3))
        np.testing.assert_array_equal(np.asarray(es.key), np.asarray(es2.key))
        assert not np.array_equal(np.asarray(es2.key),
                                  np.asarray(exp.init(seed=3).key))
