"""End-to-end test of the eval runtime + fingerprint capture pipeline at toy
sizes (the reference's generate_fingerprints flow, SURVEY.md §3.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ealv_tpu.utils.config import ExperimentConfig
from ealv_tpu.models import CVAE
from ealv_tpu.runtime.tester import EvalExperiment
from ealv_tpu.control.baselines import BaselineController
from ealv_tpu.control.target_dists import ExplrDist
from ealv_tpu.fingerprint.capture import (
    make_capture_target,
    capture_fingerprint,
)
from ealv_tpu.fingerprint.identify import FingerprintSet


def tiny_cfg(**kw):
    d = dict(
        states="xyw",
        image_dim=(24, 24, 3),
        cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(8, 8),
        hidden_dim=(64, 32), z_dim=8,
        num_target_samples=128, num_traj_samples=64,
        traj_buffer_capacity=256, buffer_capacity=256,
        batch_size=8, num_learning_opt=2,
    )
    d.update(kw)
    return ExperimentConfig(**d)


@pytest.fixture(scope="module")
def model_params():
    cfg = tiny_cfg()
    model = CVAE(img_dim=cfg.image_dim, z_dim=cfg.z_dim, s_dim=cfg.s_dim,
                 hidden_dim=cfg.model_hidden(), cnn_kernels=cfg.cnn_kernels,
                 cnn_strides=cfg.cnn_strides, cnn_channels=cfg.cnn_channels)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 3)), jnp.zeros((1, 24, 24, 3)), train=False)
    return cfg, model, params


@pytest.mark.slow
class TestEvalExperiment:
    def test_explr_with_injected_target(self, model_params):
        cfg, model, params = model_params
        target = ExplrDist.create(capacity=8, dim=3).push(
            jnp.array([0.3, 0.3, 0.0]), jnp.array([0.05, 0.05, 2.0])
        )
        ev_exp = EvalExperiment(cfg, lambda ctx, s: ctx.pdf(s))
        ev = ev_exp.init(seed=0)
        tick = jax.jit(ev_exp.tick)
        for _ in range(10):
            ev, obs = tick(ev, target)
        assert int(ev.step) == 10
        assert np.isfinite(np.asarray(obs["robot_state"])).all()
        assert obs["image"].shape == (24, 24, 3)

    def test_eval_honors_arm_backend(self, model_params):
        # capture/identification must run on the same plant the learning
        # phase used (cfg.sim_backend), not silently on the free-flyer
        cfg, model, params = model_params
        from ealv_tpu.sim.arm import ArmEnv
        cfg_arm = tiny_cfg(sim_backend="arm")
        target = ExplrDist.create(capacity=8, dim=3).push(
            jnp.array([0.3, 0.3, 0.0]), jnp.array([0.05, 0.05, 2.0])
        )
        ev_exp = EvalExperiment(cfg_arm, lambda ctx, s: ctx.pdf(s))
        assert isinstance(ev_exp.env, ArmEnv)
        ev = ev_exp.init(seed=0)
        tick = jax.jit(ev_exp.tick)
        for _ in range(5):
            ev, obs = tick(ev, target)
        assert int(ev.step) == 5
        assert np.isfinite(np.asarray(obs["robot_state"])).all()

    def test_state_subset_restriction(self, model_params):
        cfg, model, params = model_params
        target = ExplrDist.create(capacity=4, dim=2).push(
            jnp.zeros(2), jnp.full(2, 0.1)
        )
        ev_exp = EvalExperiment(cfg, lambda ctx, s: ctx.pdf(s), explr_states="xy")
        ev = ev_exp.init(seed=0)
        ev, obs = jax.jit(ev_exp.tick)(ev, target)
        assert obs["robot_state"].shape == (2,)

    def test_use_pose_reaches_target(self, model_params):
        cfg, model, params = model_params
        ev_exp = EvalExperiment(cfg, lambda ctx, s: ctx.pdf(s))
        ev = ev_exp.init(seed=0)
        target_pose = jnp.array([0.5, 0.1, 0.35, 3.14, 0.0, 0.5])
        ev = ev_exp.use_pose(ev, target_pose, n_steps=40)
        np.testing.assert_allclose(np.asarray(ev.env.pose), np.asarray(target_pose),
                                   atol=1e-2)


@pytest.mark.slow
class TestBaselines:
    def test_random_walk_stays_in_bounds(self):
        ctl = BaselineController(
            method="randomWalk", dt=0.2,
            robot_lim=((-1, 1), (-1, 1)), robot_ctrl_lim=((-1.25, 1.25),) * 2,
        )
        bs = ctl.init_state(jnp.zeros(2))
        step = jax.jit(ctl.step)
        path = []
        for _ in range(100):
            bs, full, vel = step(bs)
            path.append(np.asarray(full[:2]))
        path = np.array(path)
        assert (np.abs(path) <= 1.0 + 1e-5).all()
        # random walk: consecutive steps are correlated (smoothed)
        step_sizes = np.linalg.norm(np.diff(path, axis=0), axis=1)
        assert step_sizes.max() < 1.0

    def test_uniform_teleports(self):
        ctl = BaselineController(
            method="uniform", dt=0.2,
            robot_lim=((-1, 1), (-1, 1)), robot_ctrl_lim=((-1.25, 1.25),) * 2,
        )
        bs = ctl.init_state(jnp.zeros(2))
        pts = []
        for _ in range(50):
            bs, full, vel = jax.jit(ctl.step)(bs)
            pts.append(np.asarray(full[:2]))
        pts = np.array(pts)
        # teleporting covers the box broadly
        assert pts.std(0).min() > 0.3

    def test_save_update_nan_guard(self):
        ctl = BaselineController(
            method="uniform", dt=0.2,
            robot_lim=((-1, 1),) * 2, robot_ctrl_lim=((-1.25, 1.25),) * 2,
        )
        bs = ctl.init_state(jnp.zeros(2))
        out = ctl.save_update(bs, jnp.array([jnp.nan, 0.0, 0.0, 0.0]))
        assert np.isfinite(np.asarray(out.x)).all()


@pytest.mark.slow
class TestCapture:
    def test_capture_target_sphere(self):
        t = make_capture_target("xyw", np.array([0.3, -0.2, 0.1]), "sphere")
        assert int(t.size) == 1
        # tight xy, free angle
        np.testing.assert_allclose(np.asarray(t.stds[0]), [0.01, 0.01, 2.0])
        np.testing.assert_allclose(np.asarray(t.means[0]), [0.3, -0.2, 0.0])

    def test_capture_target_cone(self):
        t = make_capture_target("xyz", np.array([0.0, 0.0, 0.0]), "cone")
        assert int(t.size) == 500

    def test_capture_fingerprint_end_to_end(self, model_params):
        cfg, model, params = model_params
        fp = capture_fingerprint(
            model, params, cfg, np.array([0.2, 0.2, 0.0], np.float32),
            num_steps=12, seed=0,
        )
        assert fp["z_mu"].shape[1] == cfg.z_dim
        assert fp["x"].shape[0] >= 2  # captured several distinct poses
        assert fp["center_img"].shape == (24, 24, 3)
        # poses are distinct by >= 1e-3
        d = np.linalg.norm(np.diff(fp["x"], axis=0), axis=1)
        assert (d >= 1e-3).all()
        # pipes straight into the identification stage
        fps = FingerprintSet.from_lists([fp, fp])
        assert fps.x.shape[0] == 2
