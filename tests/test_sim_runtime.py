import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealv_tpu.sim import TrayScene, render_camera, SyntheticEnv
from ealv_tpu.utils.config import ExperimentConfig, kernel_std, expand_hidden
from ealv_tpu.runtime import Experiment, HyperState, hyperparam_update, entropy_grade_spread


class TestRenderer:
    def test_shapes_and_range(self):
        img = render_camera(TrayScene.default(), jnp.array([0.45, 0.0, 0.3, 0, 0, 0]))
        assert img.shape == (180, 180, 3)
        assert float(img.min()) >= 0 and float(img.max()) <= 1

    def test_image_depends_on_pose(self):
        scene = TrayScene.default()
        a = render_camera(scene, jnp.array([0.40, 0.0, 0.3, 0, 0, 0]), img_hw=(32, 32))
        b = render_camera(scene, jnp.array([0.55, 0.1, 0.3, 0, 0, 0]), img_hw=(32, 32))
        assert float(jnp.abs(a - b).mean()) > 0.01

    def test_brightness_scales(self):
        scene = TrayScene.default()
        pose = jnp.array([0.45, 0.0, 0.3, 0, 0, 0])
        dark = render_camera(scene, pose, brightness=0.2, img_hw=(32, 32))
        bright = render_camera(scene, pose, brightness=1.0, img_hw=(32, 32))
        assert float(bright.mean()) > float(dark.mean()) * 2

    def test_yaw_rotates_view(self):
        scene = TrayScene.default()
        a = render_camera(scene, jnp.array([0.45, 0.0, 0.3, 0, 0, 0.0]), img_hw=(32, 32))
        b = render_camera(scene, jnp.array([0.45, 0.0, 0.3, 0, 0, 1.5]), img_hw=(32, 32))
        assert float(jnp.abs(a - b).mean()) > 0.005

    def test_move_objects_within_lims(self):
        scene = TrayScene.default()
        lims = jnp.array([[0.35, 0.6], [-0.1, 0.1]])
        s2 = scene.move_objects(jax.random.PRNGKey(0), lims)
        xy = np.asarray(s2.obj_xy)
        assert (xy[:, 0] >= 0.35).all() and (xy[:, 0] <= 0.6).all()


class TestEnv:
    def _env(self):
        from ealv_tpu.utils.config import TRAY_LIM
        return SyntheticEnv(tray_lim=tuple(TRAY_LIM[s] for s in "xyzrpw"),
                            dt=0.04, img_hw=(32, 32))

    def test_vel_step_integrates_and_clips(self):
        env = self._env()
        s = env.init(jnp.array([0.45, 0.0, 0.3, 3.14, 0, 0]))
        for _ in range(100):
            s = env.step_vel(s, jnp.array([1.0, 0, 0, 0, 0, 0]))
        assert abs(float(s.pose[0]) - 0.625) < 1e-5  # clipped at tray x max

    def test_contact_force(self):
        env = self._env()
        scene = TrayScene.default()
        over = scene.obj_xy[0]
        s = env.init(jnp.concatenate([over, jnp.array([0.2, 3.14, 0, 0])]), scene)
        pose, vel, force, img = env.observe(s)
        assert float(force[0]) > 0  # pressing at z=0.2 < tray z min but obj height small
        s_high = env.init(jnp.concatenate([over, jnp.array([0.5, 3.14, 0, 0])]), scene)
        _, _, f_high, _ = env.observe(s_high)
        assert float(f_high[0]) == 0.0

    def test_force_blocks_descent(self):
        env = self._env()
        scene = TrayScene.default()
        # drive down onto the object: force saturates, z motion blocked
        s = env.init(jnp.concatenate([scene.obj_xy[0], jnp.array([0.21, 3.14, 0, 0])]), scene)
        step = jax.jit(env.step_vel)
        for _ in range(50):
            s = step(s, jnp.array([0, 0, -0.5, 0, 0, 0]))
        _, _, force, _ = env.observe(s)
        assert float(force[0]) <= env.max_force

    def test_pose_step(self):
        env = self._env()
        s = env.init(jnp.array([0.45, 0.0, 0.3, 3.14, 0, 0]))
        target = jnp.array([0.5, 0.1, 0.35, 3.14, 0, 0])
        for _ in range(30):
            s = env.step_pose(s, target)
        np.testing.assert_allclose(np.asarray(s.pose), np.asarray(target), atol=1e-3)


class TestConfig:
    def test_kernel_std_reference_formula(self):
        # reproduce load_config.py:130-138 exactly
        import scipy.special
        lims = np.array([[-1.0, 1.0]] * 3)
        n = 3
        ratio = 0.1 / 2000
        want = (ratio * 8.0 * scipy.special.gamma(n / 2 + 1) / np.pi ** (n / 2)) ** (1 / 3)
        got = kernel_std(lims, 2000)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_expand_hidden(self):
        # 14*14*20 = 3920 features vs hidden 512: ratio 7.66 < 8 -> unchanged
        assert expand_hidden((512, 256), 3920) == (512, 256)
        # large feature dim grows the stack
        out = expand_hidden((512, 256), 512 * 64)
        assert out[0] > 512 and out[-2:] == (512, 256)

    def test_sel_indices(self):
        cfg = ExperimentConfig(states="xyw")
        assert cfg.sel() == [0, 1, 5]
        assert cfg.tray_lim.shape == (3, 2)


def tiny_experiment(train_calls_per_tick=1, **kw):
    cfg = ExperimentConfig(
        states="xyw",
        image_dim=(24, 24, 3),
        cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(8, 8),
        hidden_dim=(64, 32),
        z_dim=8,
        num_target_samples=128,
        num_traj_samples=64,
        traj_buffer_capacity=256,
        buffer_capacity=256,
        batch_size=8,
        num_learning_opt=2,
        **kw,
    )
    return Experiment(cfg, train_calls_per_tick=train_calls_per_tick)


@pytest.mark.slow
class TestExperiment:
    @pytest.fixture(scope="class")
    def run20(self):
        exp = tiny_experiment()
        es = exp.init(seed=0)
        tick = jax.jit(exp.tick)
        infos = []
        for _ in range(20):
            es, info = tick(es)
        return exp, es, info

    def test_full_loop_runs(self, run20):
        exp, es, info = run20
        assert int(es.explr_step) == 20
        assert int(es.buf.size) == 20
        assert bool(es.mstate.initialized)
        assert np.isfinite(float(info["loss"]))
        assert np.isfinite(float(info["ergodic_cost"]))

    def test_learning_throttle(self, run20):
        exp, es, _ = run20
        # ratio <= target_learning_rate * steps (trainer_ddp.py:117-131)
        assert int(es.learning_ind) <= 3 * 20
        assert int(es.learning_ind) > 0

    def test_robot_stays_in_workspace(self, run20):
        exp, es, info = run20
        rs = np.asarray(info["robot_state"])
        assert (np.abs(rs) <= 1.3).all()

    def test_run_chunk_scan(self):
        exp = tiny_experiment()
        es = exp.init(seed=1)
        run = jax.jit(lambda s: exp.run_chunk(s, 5))
        es2, infos = run(es)
        assert int(es2.explr_step) == 5
        assert infos["ergodic_cost"].shape == (5,)

    def test_hyperparams_entropy_mode(self, run20):
        exp, es, info = run20
        # entropy-based beta = grade <= 0.01 by clamp (trainer_module.py:539)
        assert 0 <= float(info["beta"]) <= 0.01
        assert 0 <= float(info["gamma"]) <= 1.0

    def test_hyper_fold_loss_equivalence(self):
        # hyper_from_planner reuses the planner's same-tick pdf decode +
        # coverage spread for the beta/gamma schedule (inputs shifted by
        # one observation vs the reference's pre_train_mp recompute). The
        # schedules feed training, so equivalence is asserted on the LOSS
        # trajectory and on the hyperparameter magnitudes.
        res = {}
        for fold in (True, False):
            exp = tiny_experiment(hyper_from_planner=fold)
            es = exp.init(seed=0)
            run = jax.jit(lambda s: exp.run_chunk(s, 30))
            _, infos = run(es)
            res[fold] = (np.asarray(infos["loss"]),
                         np.asarray(infos["gamma"]))
        lf, gf = res[True]
        ls, gs = res[False]
        # same convergence trajectory
        scale = np.abs(ls[5:]).mean()
        assert np.abs(lf[5:] - ls[5:]).mean() < 0.1 * scale
        assert abs(lf[-1] - ls[-1]) < 0.05 * max(abs(ls[-1]), 1e-3)
        # spreads live on the same scale (both are mean normalized
        # coverage over near-identical visited-state sets)
        assert abs(gf[10:].mean() - gs[10:].mean()) < 0.5 * gs[10:].mean()

    def test_hyper_fold_loss_equivalence_multicall(self):
        # ADVICE r3: with train_calls_per_tick > 1 the fold freezes
        # grade/spread across a tick's inner trainer calls, while the
        # reference-literal path re-decodes with the updated params per
        # call (pre_train_mp per trainer call). The schedules only feed
        # beta/gamma, so the loss trajectory must still agree.
        res = {}
        for fold in (True, False):
            exp = tiny_experiment(train_calls_per_tick=3,
                                  hyper_from_planner=fold)
            es = exp.init(seed=0)
            run = jax.jit(lambda s: exp.run_chunk(s, 30))
            _, infos = run(es)
            res[fold] = (np.asarray(infos["loss"]),
                         np.asarray(infos["gamma"]))
        lf, gf = res[True]
        ls, gs = res[False]
        scale = np.abs(ls[5:]).mean()
        assert np.abs(lf[5:] - ls[5:]).mean() < 0.1 * scale
        assert abs(lf[-1] - ls[-1]) < 0.05 * max(abs(ls[-1]), 1e-3)
        assert abs(gf[10:].mean() - gs[10:].mean()) < 0.5 * gs[10:].mean()

    def test_post_train_chunk(self, run20):
        # post-exploration phase (trainer_ddp.py:202-249): trainer calls
        # with no exploration — learning_ind advances, explr_step/buffer
        # frozen, params change, losses finite
        exp, es, _ = run20
        post = jax.jit(lambda s: exp.post_train_chunk(s, 4))
        es2, pinfos = post(es)
        assert int(es2.learning_ind) == int(es.learning_ind) + 4
        assert int(es2.explr_step) == int(es.explr_step)
        assert int(es2.buf.size) == int(es.buf.size)
        assert np.isfinite(np.asarray(pinfos["loss"])).all()
        p0 = jax.tree.leaves(es.params)[0]
        p1 = jax.tree.leaves(es2.params)[0]
        assert float(jnp.abs(p0 - p1).max()) > 0
        # each call pushes one grade/spread pair into the hyperparam ring
        assert int(es2.buf.beta_size) == min(
            int(es.buf.beta_size) + 4, es.buf.beta.shape[0])


class TestSchedules:
    def test_manual_ramp(self):
        hs = HyperState.create()
        hs = hs._replace(iter=jnp.asarray(500, jnp.int32))
        out = hyperparam_update(
            hs, 0.0, 0.0, beta_manual_ramp=True, gamma_manual_ramp=True,
            beta_start=0.0, beta_end=0.05, beta_warmup_steps=100, beta_warmup_epoch=10,
            gamma_start=0.0, gamma_end=1.0, gamma_warmup_steps=100, gamma_warmup_epoch=10,
        )
        np.testing.assert_allclose(float(out.beta), 0.05 / 100 * 50, rtol=1e-5)

    def test_fixed(self):
        hs = HyperState.create()
        out = hyperparam_update(hs, 0.9, 0.9, fixed_beta=True, fixed_gamma=True,
                                beta_start=0.02, gamma_start=0.3)
        np.testing.assert_allclose(float(out.beta), 0.02)
        np.testing.assert_allclose(float(out.gamma), 0.3)

    def test_grade_clamp(self):
        # pdf with a very low min -> grade hits the 0.01 clamp
        pdf = jnp.array([1e-8, 1.0, 0.5])
        all_x = jnp.zeros((4, 2)); mask = jnp.ones(4)
        samples = jnp.zeros((3, 2))
        grade, spread = entropy_grade_spread(pdf, all_x, mask, samples,
                                             jnp.arange(2), jnp.full(2, 0.1))
        assert float(grade) <= 0.01
