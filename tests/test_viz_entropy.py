"""Entropy slices (fingerprint/entropy.py) + live dashboard (viz/dashboard.py).

Parity: get_dists (dist_modules/fingerprint_builder.py:335-417) and the
streaming Plotter/Plotter3D dashboards (plotting_pyqtgraph.py:31-509,
plotting_matplotlib.py:310-520).
"""

import os

import jax
import numpy as np
import pytest

from ealv_tpu.utils.config import ExperimentConfig
from ealv_tpu.runtime import Experiment


@pytest.fixture(scope="module")
def small_run():
    cfg = ExperimentConfig(
        states="xyz",
        image_dim=(24, 24, 3),
        cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(8, 8),
        hidden_dim=(64, 32), z_dim=8,
        num_target_samples=128, num_traj_samples=64,
        traj_buffer_capacity=256, buffer_capacity=256,
        batch_size=8, num_learning_opt=2,
    )
    exp = Experiment(cfg, train_calls_per_tick=1)
    es = exp.init(seed=0)
    run = jax.jit(lambda s: exp.run_chunk(s, 15))
    es, _ = run(es)
    return exp, es


@pytest.mark.slow
class TestEntropySlices:
    def test_variants_and_shapes(self, small_run):
        from ealv_tpu.fingerprint import entropy_slices
        exp, es = small_run
        out = entropy_slices(
            exp.model, es.params, es.buf, jax.random.PRNGKey(0),
            exp.cfg.robot_lim, exp.cfg.states,
            num_samples=64, num_seeds=3, grid_pts=4,
        )
        # 'z' in states -> the reference's three z-range variants
        assert set(out) == {"posz", "negz", "allz"}
        for name, (samples, marg) in out.items():
            assert samples.shape == (68, 2)  # 64 + 4 corners
            assert marg.shape == (68,)
            assert np.isfinite(marg).all()
            assert marg.max() <= 1.0 + 1e-6  # renormalized (max-shifted)
            assert marg.min() >= 0.0

    def test_pin_clamps_sampling_range(self):
        from ealv_tpu.fingerprint.entropy import _slice_lims
        lims = np.array([[-1.0, 1.0]] * 3, np.float32)
        out = _slice_lims(lims, 1.15, pin=(2, 0))
        assert out[2, 0] == 0.0  # posz: z lower bound pinned at 0
        assert out[2, 1] > 1.0  # scaled
        out = _slice_lims(lims, 1.15, pin=(2, 1))
        assert out[2, 1] == 0.0  # negz: z upper bound pinned
        # plot dims scaled symmetrically
        np.testing.assert_allclose(out[0], [-1.15, 1.15], rtol=1e-5)

    def test_no_z_state_single_variant(self, small_run):
        from ealv_tpu.fingerprint import entropy_slices
        exp, es = small_run
        # same 3-dim model, but a state string without 'z' -> one slice
        out = entropy_slices(
            exp.model, es.params, es.buf, jax.random.PRNGKey(0),
            exp.cfg.robot_lim, "xyw",
            num_samples=32, num_seeds=2, grid_pts=3,
        )
        assert set(out) == {"all"}

    def test_figure_render(self, small_run, tmp_path):
        from ealv_tpu.fingerprint import entropy_slices
        from ealv_tpu.viz import plot_entropy_slices
        exp, es = small_run
        out = entropy_slices(
            exp.model, es.params, es.buf, jax.random.PRNGKey(0),
            exp.cfg.robot_lim, exp.cfg.states,
            num_samples=32, num_seeds=2, grid_pts=3,
        )
        paths = plot_entropy_slices(str(tmp_path), out)
        assert len(paths) == 3
        for p in paths:
            assert os.path.exists(p) and os.path.getsize(p) > 0


@pytest.mark.slow
class TestLiveDashboard:
    def test_render_frame(self, small_run, tmp_path):
        from ealv_tpu.viz import LiveDashboard
        exp, es = small_run
        dash = LiveDashboard(exp, str(tmp_path), grid=12)
        series = {"loss": [np.float32(1.0), np.float32(0.5)],
                  "ergodic_cost": [np.float32(3.0)]}
        path = dash.render(es, series, step=15)
        assert os.path.basename(path) == "dashboard.png"
        assert os.path.getsize(path) > 0
        assert os.path.exists(os.path.join(str(tmp_path), "dashboard.html"))
        # second frame replaces atomically (no tmp file left behind)
        dash.render(es, series, step=16)
        assert not os.path.exists(os.path.join(str(tmp_path),
                                               ".dashboard.tmp.png"))

    def test_baseline_method_omits_dists(self, tmp_path):
        from ealv_tpu.viz import LiveDashboard
        cfg = ExperimentConfig(
            states="xyw", explr_method="randomWalk",
            image_dim=(24, 24, 3),
            cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(8, 8),
            hidden_dim=(64, 32), z_dim=8,
            num_target_samples=128, num_traj_samples=64,
            traj_buffer_capacity=256, buffer_capacity=256,
            batch_size=8, num_learning_opt=2,
        )
        exp = Experiment(cfg, train_calls_per_tick=1)
        es = exp.init(seed=0)
        es, _ = jax.jit(lambda s: exp.run_chunk(s, 4))(es)
        dash = LiveDashboard(exp, str(tmp_path), grid=8)
        path = dash.render(es, None, step=4)
        assert os.path.getsize(path) > 0
