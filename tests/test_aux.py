"""Tests for auxiliary subsystems: trajectories, watchdogs, clustering
monitor, yaml config, plotting, fingerprint test runtime."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ealv_tpu.utils.trajectories import circular_traj, grid_traj
from ealv_tpu.utils.config import ExperimentConfig
from ealv_tpu.runtime.watchdog import (
    GracefulKiller,
    StuckDetector,
    PauseManager,
    GoalSeeker,
    RecoveryHeartbeat,
)
from ealv_tpu.fingerprint.monitor import ClusteringMonitor, cluster_stability_error
from ealv_tpu.viz import (
    ExplorationPlotter,
    TrainingPlotter,
    EvalPlotter,
    BeliefPlotter,
    plot_clusters,
)


class TestTrajectories:
    def test_circular(self):
        t = circular_traj(radius=0.3, num_points=12, center=(0.1, 0.2), start=0)
        assert t.shape == (12, 2)
        r = np.linalg.norm(t - np.array([0.1, 0.2]), axis=1)
        np.testing.assert_allclose(r, 0.3, rtol=1e-5)

    def test_grid_serpentine(self):
        t = grid_traj(grid_size=0.4, num_points=9, center=(0, 0))
        assert t.shape == (9, 2)
        # consecutive points stay adjacent (serpentine connectivity)
        steps = np.linalg.norm(np.diff(t, axis=0), axis=1)
        assert steps.max() < 0.45


class TestWatchdogs:
    def test_stuck_detector(self):
        sd = StuckDetector()
        ok, esc = sd.check([0.0, 0.0, 0.0])
        assert ok  # first sample can't be stuck
        ok, esc = sd.check([0.0, 0.0, 0.0], force=[1.0, 0.0, 0.0])
        assert not ok
        np.testing.assert_allclose(esc, [0.05, 0, 0], atol=1e-8)
        ok, _ = sd.check([0.1, 0.0, 0.0])
        assert ok

    def test_pause_manager(self):
        pm = PauseManager()
        pm.pause(); assert pm.paused
        pm.resume(); assert not pm.paused
        pm.request_save()
        assert pm.consume_save() and not pm.consume_save()

    def test_goal_seeker_success(self):
        gs = GoalSeeker(pos_tol=0.05, max_tries=10)
        state = {"pos": np.zeros(2)}
        def step_fn(goal):
            state["pos"] = state["pos"] + 0.4 * (goal - state["pos"])
            return state["pos"]
        ok, pos = gs.seek(np.array([1.0, 1.0]), step_fn)
        assert ok

    def test_goal_seeker_gives_up_and_escalates(self):
        calls = {"reset": 0}
        gs = GoalSeeker(pos_tol=0.01, max_tries=6)
        ok, _ = gs.seek(np.array([1.0, 0.0]),
                        step_fn=lambda g: np.zeros(2),
                        reset_fn=lambda: calls.__setitem__("reset", calls["reset"] + 1))
        assert not ok and calls["reset"] == 1

    def test_heartbeat_recovers(self):
        pm = PauseManager(); pm.pause()
        hb = RecoveryHeartbeat(timeout_s=0.0)
        hit = {"n": 0}
        hb.tick(pm)  # records paused_since
        hb.tick(pm, recover_fn=lambda: hit.__setitem__("n", hit["n"] + 1))
        assert hit["n"] == 1 and not pm.paused

    def test_killer_flag(self):
        k = GracefulKiller(install=False)
        assert not k.kill_now
        k._exit(None, None)
        assert k.kill_now


class TestClusterMonitor:
    def test_stability_error_permutation_invariant(self):
        a = np.array([[0.0, 0.0], [1.0, 1.0]])
        b = np.array([[1.0, 1.0], [0.0, 0.0]])  # permuted
        assert cluster_stability_error(a, b) < 1e-12
        assert cluster_stability_error(a, a[:1]) == np.inf

    @pytest.mark.slow
    def test_monitor_stability_gate(self, tmp_path):
        from ealv_tpu.models import CVAE
        model = CVAE(img_dim=(16, 16, 3), z_dim=4, s_dim=2, hidden_dim=(32, 16),
                     cnn_kernels=(3,), cnn_strides=(2,), cnn_channels=(4,))
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key}, jnp.zeros((1, 2)),
                            jnp.zeros((1, 16, 16, 3)), train=False)
        mon = ClusteringMonitor(model=model, robot_lim=[[-1, 1], [-1, 1]],
                                num_pts=100, dir_path=str(tmp_path),
                                cluster_kwargs=dict(bandwidth=0.5))
        seeds_x = jax.random.uniform(key, (2, 2), minval=-1, maxval=1)
        seeds_y = jax.random.uniform(key, (2, 16, 16, 3))
        hits = {"ckpt": 0}
        # same params + same key -> identical clusters -> stable on 2nd pass
        mon.update(params, seeds_x, seeds_y, key, 10)
        res, stable = mon.update(params, seeds_x, seeds_y, key, 20,
                                 checkpoint_fn=lambda s: hits.__setitem__("ckpt", 1))
        if len(res.means):
            assert stable and hits["ckpt"] == 1
        path = mon.save_log()
        assert os.path.exists(path)


class TestYamlConfig:
    def test_roundtrip(self, tmp_path):
        cfg = ExperimentConfig(states="xyz", z_dim=12, batch_size=16)
        p = str(tmp_path / "config.yaml")
        cfg.to_yaml(p)
        cfg2 = ExperimentConfig.from_yaml(p)
        assert cfg2 == cfg

    def test_overrides_and_extra_keys(self, tmp_path):
        cfg = ExperimentConfig()
        p = str(tmp_path / "config.yaml")
        cfg.to_yaml(p)
        with open(p, "a") as f:
            f.write("rosparam_junk: 42\n")  # tolerated like rosparam merge
        cfg2 = ExperimentConfig.from_yaml(p, states="xy")
        assert cfg2.states == "xy"


class TestPlotting:
    def test_exploration_plot(self, tmp_path, rng):
        pl = ExplorationPlotter(str(tmp_path), robot_lim=[[-1, 1], [-1, 1]])
        path = pl.render(
            image=rng.uniform(0, 1, (24, 24, 3)),
            img_pred=rng.uniform(0, 1, (24, 24, 3)),
            z_mu=rng.standard_normal(8), z_var=rng.uniform(0.1, 1, 8),
            path_xy=rng.uniform(-1, 1, (30, 2)),
            samples=rng.uniform(-1, 1, (100, 2)),
            p=rng.uniform(0, 1, 100), q=rng.uniform(0, 1, 100),
            costs=rng.uniform(0, 5, 50), step=7,
        )
        assert os.path.getsize(path) > 1000

    def test_training_plot(self, tmp_path, rng):
        pl = TrainingPlotter(str(tmp_path))
        path = pl.render({"loss": rng.uniform(0, 1, 50), "kl": rng.uniform(0, 1, 50),
                          "beta": rng.uniform(0, 0.01, 50)})
        assert os.path.getsize(path) > 1000

    def test_eval_plot(self, tmp_path, rng):
        pl = EvalPlotter(str(tmp_path))
        img = rng.uniform(0, 1, (24, 24, 3))
        path = pl.render(img, img, img, z_mu=rng.standard_normal(8),
                         z_var=rng.uniform(0.1, 1, 8))
        assert os.path.getsize(path) > 1000

    def test_belief_plot(self, tmp_path):
        from ealv_tpu.fingerprint import FingerprintBelief
        b = FingerprintBelief.create("xy", [[-1, 1], [-1, 1]], num_samples=15)
        b = b.push(jnp.array([0.3, 0.3]), jnp.asarray(0.1)).update_prior()
        pl = BeliefPlotter(str(tmp_path))
        path = pl.render([b], names=["obj0"], truth_xy=[(0.3, 0.3)])
        assert os.path.getsize(path) > 1000

    def test_cluster_plot(self, tmp_path, rng):
        path = plot_clusters(
            str(tmp_path),
            points=rng.uniform(-1, 1, (50, 2)),
            labels=rng.integers(-1, 2, 50),
            means=np.array([[0.3, 0.3], [-0.4, -0.4]]),
            samples=rng.uniform(-1, 1, (80, 2)),
            weights=rng.uniform(0, 1, 80),
        )
        assert os.path.getsize(path) > 1000


class TestEvaluate:
    @pytest.mark.slow
    def test_evaluate_test_set(self, tmp_path, rng):
        from ealv_tpu.models import CVAE
        from ealv_tpu.runtime.evaluate import evaluate_test_set, imagined_views

        model = CVAE(img_dim=(16, 16, 3), z_dim=4, s_dim=3, hidden_dim=(32, 16),
                     cnn_kernels=(3,), cnn_strides=(2,), cnn_channels=(4,))
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 3)), jnp.zeros((1, 16, 16, 3)),
                            train=False)
        poses = rng.uniform(-1, 1, (6, 3)).astype(np.float32)
        images = rng.uniform(0, 1, (6, 16, 16, 3)).astype(np.float32)
        m = evaluate_test_set(model, params, poses, images)
        assert m["recon_mse"].shape == (6,)
        assert np.isfinite(m["mean_nll"])
        assert 0 <= m["active_units"] <= 4

        imagined, lv = imagined_views(model, params, poses[0], images[0], poses[1:3])
        assert imagined.shape == (2, 16, 16, 3)

    def test_eval_report_from_npz(self, tmp_path, rng):
        from ealv_tpu.models import CVAE
        from ealv_tpu.runtime.evaluate import eval_report
        from ealv_tpu.utils.config import ExperimentConfig

        cfg = ExperimentConfig()
        model = CVAE(img_dim=(16, 16, 3), z_dim=4, s_dim=3, hidden_dim=(32, 16),
                     cnn_kernels=(3,), cnn_strides=(2,), cnn_channels=(4,))
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 3)), jnp.zeros((1, 16, 16, 3)),
                            train=False)
        # fake a collect_test_set artifact (tray poses)
        npz = str(tmp_path / "ts.npz")
        np.savez(npz, poses=rng.uniform(0.3, 0.6, (5, 6)).astype(np.float32),
                 images=rng.uniform(0, 1, (5, 16, 16, 3)).astype(np.float32),
                 forces=np.zeros((5, 1), np.float32))
        m = eval_report(model, params, npz, str(tmp_path), n_panels=2)
        assert np.isfinite(m["mean_mse"])
        import os
        assert os.path.exists(str(tmp_path / "eval_0.png"))

    def test_multi_eval_plot(self, tmp_path, rng):
        from ealv_tpu.viz import MultiEvalPlotter
        img = lambda: rng.uniform(0, 1, (24, 24, 3))
        p = MultiEvalPlotter(str(tmp_path)).render(
            [(img(), img(), img(), "a"), (img(), img(), img())])
        assert os.path.getsize(p) > 1000
