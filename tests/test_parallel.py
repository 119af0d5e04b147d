"""Multi-device tests on the virtual 8-CPU mesh (conftest forces
xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ealv_tpu.models import CVAE
from ealv_tpu.models.cvae import init_model_state, update_dist
from ealv_tpu.data import ReplayBuffer
from ealv_tpu.runtime import TrainerStatics, train_call
from ealv_tpu.parallel import make_mesh, dp_train_call, sharded_pdf


@pytest.fixture(scope="module")
def setup():
    model = CVAE(img_dim=(24, 24, 3), z_dim=8, s_dim=3, hidden_dim=(64, 32),
                 cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(8, 8))
    key = jax.random.PRNGKey(0)
    params = model.init({"params": key}, jnp.zeros((1, 3)), jnp.zeros((1, 24, 24, 3)),
                        train=False)
    buf = ReplayBuffer.create(128, 3, (24, 24, 3))

    def push_n(buf, key, n):
        def body(b, k):
            x = jax.random.uniform(k, (3,), minval=-1, maxval=1)
            y = jax.random.uniform(jax.random.fold_in(k, 1), (24, 24, 3))
            return b.push(x, y), None
        return jax.lax.scan(body, buf, jax.random.split(key, n))[0]

    buf = jax.jit(push_n, static_argnums=2)(buf, key, 40)
    statics = TrainerStatics(model=model, batch_size=16, num_learning_opt=3)
    opt_state = statics.make_optimizer().init(params)
    return model, params, opt_state, buf, statics


class TestMesh:
    def test_eight_virtual_devices(self):
        assert len(jax.devices()) == 8
        mesh = make_mesh(8)
        assert mesh.shape["data"] == 8

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(64)


@pytest.mark.slow
class TestDPTrain:
    def test_runs_and_learns(self, setup):
        model, params, opt_state, buf, statics = setup
        mesh = make_mesh(8)
        key = jax.random.PRNGKey(1)
        p2, o2, metrics = jax.jit(
            lambda p, o, b, k: dp_train_call(statics, mesh, p, o, b, k, 0.01, 0.0)
        )(params, opt_state, buf, key)
        assert metrics["loss"].shape == (3,)
        assert np.isfinite(np.asarray(metrics["loss"])).all()
        # params actually changed
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), params, p2)
        assert max(jax.tree.leaves(diff)) > 0

    def test_matches_single_device_gradient(self, setup):
        """DP grads pmean'd over disjoint slices of one global batch must
        equal the single-device grads on that full batch (same key) — the
        correctness contract of DDP."""
        model, params, opt_state, buf, statics = setup
        statics1 = TrainerStatics(model=model, batch_size=16, num_learning_opt=1)
        mesh = make_mesh(8)
        key = jax.random.PRNGKey(2)
        # to compare updates directly, use plain SGD so update == -lr*grad
        import dataclasses as dc
        sgd1 = dc.replace(statics1, lr=0.1)
        opt_state_sgd = sgd1.make_optimizer().init(params)

        p_dp, _, _ = jax.jit(
            lambda p, o, b, k: dp_train_call(sgd1, mesh, p, o, b, k, 0.0, 0.0,
                                             weighted=False, deterministic=True)
        )(params, opt_state_sgd, buf, key)
        p_one, _, _ = jax.jit(
            lambda p, o, b, k: train_call(sgd1, p, o, b, k, 0.0, 0.0, weighted=False,
                                          deterministic=True)
        )(params, opt_state_sgd, buf, key)
        # guards the shard_map autodiff semantics dp_train_call relies on:
        # replicated-input cotangents are auto-psum'd, so grads are scaled
        # by 1/n — any change in that behavior breaks this equality
        for a, b in zip(jax.tree.leaves(p_dp), jax.tree.leaves(p_one)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)


class TestShardedPdf:
    def test_matches_replicated(self, setup):
        model, params, opt_state, buf, statics = setup
        mesh = make_mesh(8)
        mstate = init_model_state(model)
        x = jnp.array([0.1, -0.2, 0.3])
        y = jax.random.uniform(jax.random.PRNGKey(3), (24, 24, 3))
        mstate, _ = update_dist(model, params, mstate, x, y)
        samples = jax.random.uniform(jax.random.PRNGKey(4), (64, 3), minval=-1, maxval=1)
        p_sharded = jax.jit(
            lambda pr, ms, s: sharded_pdf(model, mesh, pr, ms, s)
        )(params, mstate, samples)
        p_local = model.apply(params, mstate, samples, method=CVAE.pdf)
        np.testing.assert_allclose(np.asarray(p_sharded), np.asarray(p_local),
                                   rtol=1e-4, atol=1e-6)


@pytest.mark.slow
class TestMeshExperiment:
    def test_full_tick_on_mesh(self):
        """The whole explore+learn tick with mesh-parallel trainer +
        sample-sharded pdf must run and track the single-device run."""
        from ealv_tpu.utils.config import ExperimentConfig
        from ealv_tpu.runtime import Experiment

        cfg = ExperimentConfig(
            states="xyw", image_dim=(24, 24, 3), cnn_kernels=(3, 3),
            cnn_strides=(2, 2), cnn_channels=(8, 8), hidden_dim=(64, 32),
            z_dim=8, num_target_samples=64, num_traj_samples=32,
            traj_buffer_capacity=128, buffer_capacity=128,
            batch_size=16, num_learning_opt=2,
        )
        mesh = make_mesh(8)
        exp_m = Experiment(cfg, train_calls_per_tick=1, mesh=mesh)
        exp_1 = Experiment(cfg, train_calls_per_tick=1)
        es_m, es_1 = exp_m.init(seed=0), exp_1.init(seed=0)
        tick_m, tick_1 = jax.jit(exp_m.tick), jax.jit(exp_1.tick)
        for _ in range(4):
            es_m, info_m = tick_m(es_m)
            es_1, info_1 = tick_1(es_1)
        assert int(es_m.learning_ind) == int(es_1.learning_ind)
        # exploration trajectories agree closely (training noise sharding is
        # the only divergence source)
        np.testing.assert_allclose(np.asarray(info_m["robot_state"]),
                                   np.asarray(info_1["robot_state"]), atol=0.05)

    def test_mesh_divisibility_guard(self):
        from ealv_tpu.utils.config import ExperimentConfig
        from ealv_tpu.runtime import Experiment
        cfg = ExperimentConfig(states="xyw", image_dim=(24, 24, 3),
                               cnn_kernels=(3, 3), cnn_strides=(2, 2),
                               cnn_channels=(8, 8), hidden_dim=(64, 32),
                               z_dim=8, num_target_samples=64,
                               num_traj_samples=32, traj_buffer_capacity=128,
                               buffer_capacity=128, batch_size=10,  # !% 8
                               num_learning_opt=2)
        with pytest.raises(ValueError):
            Experiment(cfg, mesh=make_mesh(8))
