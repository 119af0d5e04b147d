"""Fingerprint method matrix (fingerprint/test_runtime.py::
FingerprintMatrixRuntime): every (dist_method x error_mode) combo evaluated
from ONE exploration stream, with per-combo beliefs, results table, and
artifacts (parity: test_fingerprint_main.py:77-169, fingerprint_mp:216-240).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from ealv_tpu.utils.config import ExperimentConfig
from ealv_tpu.models import CVAE
from ealv_tpu.fingerprint.identify import FingerprintSet
from ealv_tpu.fingerprint.test_runtime import FingerprintMatrixRuntime


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
def matrix_run():
    cfg = tiny_cfg()
    model = CVAE(img_dim=cfg.image_dim, z_dim=cfg.z_dim, s_dim=cfg.s_dim,
                 hidden_dim=cfg.model_hidden(), cnn_kernels=cfg.cnn_kernels,
                 cnn_strides=cfg.cnn_strides, cnn_channels=cfg.cnn_channels)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 3)), jnp.zeros((1, 24, 24, 3)),
                        train=False)
    dicts = []
    for i in range(2):
        s = 5 + i
        dicts.append({
            "z_mu": np.random.default_rng(i).standard_normal((s, 8)).astype(np.float32),
            "z_var": np.full((s, 8), -1.0, np.float32),
            "x": np.random.default_rng(10 + i).uniform(-1, 1, (s, 3)).astype(np.float32),
            "center": np.array([0.3 * i, -0.3 * i, 0.0], np.float32),
            "center_img": np.zeros((24, 24, 3), np.float32),
        })
    fps = FingerprintSet.from_lists(dicts)
    rt = FingerprintMatrixRuntime(
        cfg, model, params, fps,
        combos=(("L2", False), ("KL", False), ("L2", True)),
        update_tdist_step=4,
    )
    beliefs, history = rt.run(n_steps=8, seed=0)
    return rt, beliefs, history


class TestMatrixRuntime:
    def test_all_combos_updated(self, matrix_run):
        rt, beliefs, history = matrix_run
        assert set(beliefs) == {"L2", "KL", "L2_error"}
        for key, bels in beliefs.items():
            assert len(bels) == 2  # one belief per fingerprint
            for b in bels:
                grid = np.asarray(b.pdf_grid())
                assert np.isfinite(grid).all()

    def test_history_records_every_combo(self, matrix_run):
        rt, beliefs, history = matrix_run
        assert len(history) == 8
        for rec in history:
            for key in ("L2", "KL", "L2_error"):
                assert rec[key].shape == (2,)
                assert np.isfinite(rec[key]).all()
        # different methods actually produce different distances
        l2 = np.stack([r["L2"] for r in history])
        kl = np.stack([r["KL"] for r in history])
        assert not np.allclose(l2, kl)

    def test_results_table(self, matrix_run):
        rt, beliefs, history = matrix_run
        truth = np.array([[0.3, 0.3, 0.0], [-0.3, -0.3, 0.0]], np.float32)
        table = rt.results_table(truth=truth)
        assert set(table) == {"L2", "KL", "L2_error"}
        for key, row in table.items():
            assert row["peaks"].shape[0] == 2
            assert row["error"].shape == (2,)
            assert np.isfinite(row["mean_error"])

    def test_save_per_combo_artifacts(self, matrix_run, tmp_path):
        rt, beliefs, history = matrix_run
        paths = rt.save(str(tmp_path))
        assert set(paths) == {"L2", "KL", "L2_error"}
        for p in paths.values():
            assert os.path.exists(p) and os.path.getsize(p) > 0


class TestAdoptionSteersExploration:
    """The in-device belief-adoption switch must actually steer the
    planner: with contrasty beliefs, different adopted objects must give
    different post-adoption trajectories (a silently-dead switch would be
    invisible to every other test — beliefs still update, tables still
    print). Near-flat beliefs legitimately leave trajectories identical
    (the adopted pdf is then ~uniform), so the probe seeds broad, sharply
    distinct priors."""

    def test_post_adoption_trajectories_diverge(self, matrix_run):
        rt_src, _, _ = matrix_run
        paths = {}
        for fpk in (0, 1):
            rt = FingerprintMatrixRuntime(
                rt_src.cfg, rt_src.model, rt_src.params, rt_src.fps,
                combos=(("L2", False),), seek_fingerprint=fpk,
                update_tdist_step=3,
            )
            b = rt.beliefs["L2"][fpk]
            g = np.asarray(b.grid)
            ctr = np.array([0.7, 0.7, 0.0]) if fpk == 0 else \
                np.array([-0.7, -0.7, 0.0])
            p = np.exp(-0.5 * np.sum((g - ctr) ** 2, 1) / 0.04)
            rt.beliefs["L2"][fpk] = b.replace(
                prior=jnp.asarray(p, jnp.float32))
            _, hist = rt.run(n_steps=12, seed=0)
            paths[fpk] = np.stack([h["robot_state"] for h in hist])
        d = np.abs(paths[0] - paths[1])
        assert d[:3].max() == 0.0  # pre-adoption: same uniform exploration
        assert d[4:].max() > 1e-4  # post-adoption: the target steers


class TestUncertainSeek:
    """Active re-localization (VERDICT r3 weak #3): the exploration target
    follows the LEAST-localized object's belief instead of one fixed
    fingerprint's."""

    def test_entropy_orders_flat_above_sharp(self):
        from ealv_tpu.fingerprint.belief import FingerprintBelief
        from ealv_tpu.fingerprint.test_runtime import _belief_entropies

        lims = np.array([[-1, 1], [-1, 1]], np.float64)
        flat = FingerprintBelief.create("xy", lims)
        sharp = FingerprintBelief.create("xy", lims)
        # sharply-localized belief: one grid cell dominates
        peaked = jnp.full_like(sharp.prior, 0.01).at[123].set(5.0)
        sharp = sharp.replace(prior=peaked)
        ents = _belief_entropies([flat, sharp])
        assert float(ents[0]) > float(ents[1])

    def test_uncertain_mode_runs_and_matches_structure(self, matrix_run):
        rt_fixed, _, _ = matrix_run
        rt = FingerprintMatrixRuntime(
            rt_fixed.cfg, rt_fixed.model, rt_fixed.params, rt_fixed.fps,
            combos=(("L2", False), ("KL", False)),
            seek_mode="uncertain", update_tdist_step=3,
        )
        beliefs, history = rt.run(n_steps=8, seed=1)
        assert set(beliefs) == {"L2", "KL"}
        for bels in beliefs.values():
            for b in bels:
                assert np.isfinite(np.asarray(b.pdf_grid())).all()
        assert len(history) == 8
        # the targeted object is recorded per step and stays in range
        assert all(0 <= rec["seek_k"] < 2 for rec in history)
        assert rt.seek_history.shape == (8,)

    def test_uncertain_target_selects_flat_object(self):
        # the in-device select must pick the flat (max-entropy) belief:
        # verify via the same stack/argmax machinery the fused program uses
        from ealv_tpu.fingerprint.belief import FingerprintBelief
        from ealv_tpu.fingerprint.test_runtime import _belief_entropies

        lims = np.array([[-1, 1], [-1, 1]], np.float64)
        b0 = FingerprintBelief.create("xy", lims)
        b0 = b0.replace(prior=jnp.full_like(b0.prior, 0.01).at[7].set(9.0))
        b1 = FingerprintBelief.create("xy", lims)  # flat: least localized
        beliefs_k = [b0, b1]
        k_star = jnp.argmax(_belief_entropies(beliefs_k))
        sel = jax.tree.map(lambda *xs: jnp.stack(xs)[k_star], *beliefs_k)
        assert int(k_star) == 1
        np.testing.assert_allclose(np.asarray(sel.prior),
                                   np.asarray(b1.prior))


class TestTargetSharpening:
    """The adopted belief is renormalized and sharpened before it reaches
    the planner (test_runtime._make_target_pdf): the raw ~[0,1] belief grid
    is unnormalized and nearly flat, which is measured to leave the
    KL-ergodic line search rejecting every window (target-blind
    exploration — the reference's own weakness,
    test_fingerprint_main.py:262-268)."""

    def test_flat_belief_stays_uniform(self):
        from ealv_tpu.fingerprint.belief import FingerprintBelief
        from ealv_tpu.fingerprint.test_runtime import _make_target_pdf

        lims = np.array([[-1, 1], [-1, 1]], np.float64)
        b = FingerprintBelief.create("xy", lims)  # constant 0.5 prior
        pdf = _make_target_pdf(20.0)
        samples = jnp.asarray(np.random.default_rng(0).uniform(
            -1, 1, (64, 2)), jnp.float32)
        p = np.asarray(pdf(b, samples))
        np.testing.assert_allclose(p, 1.0, rtol=1e-5)

    def test_sharpness_raises_contrast(self):
        from ealv_tpu.fingerprint.belief import FingerprintBelief
        from ealv_tpu.fingerprint.test_runtime import _make_target_pdf

        lims = np.array([[-1, 1], [-1, 1]], np.float64)
        b = FingerprintBelief.create("xy", lims)
        g = np.asarray(b.grid)
        peak = np.exp(-np.sum((g - np.array([0.5, 0.5])) ** 2, 1) / 0.05)
        b = b.replace(prior=jnp.asarray(0.5 + 0.4 * peak, jnp.float32))
        samples = jnp.asarray(np.random.default_rng(1).uniform(
            -1, 1, (256, 2)), jnp.float32)
        raw = np.asarray(_make_target_pdf(1.0)(b, samples))
        sharp = np.asarray(_make_target_pdf(20.0)(b, samples))
        # both normalized to max 1; the sharpened one concentrates mass
        assert raw.max() == 1.0 and sharp.max() == 1.0
        assert (raw.min() / raw.max()) > 0.4      # raw belief: ~2:1 contrast
        assert (sharp.min() / sharp.max()) < 1e-3  # sharpened: real contrast
        # the peak sample stays the peak
        assert np.argmax(raw) == np.argmax(sharp)
