import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ealv_tpu.fingerprint import (
    latent_distance,
    FingerprintBelief,
    marginalize_angles,
    mean_shift,
    merge_overlapping,
    find_clusters,
)
from ealv_tpu.fingerprint.clustering import extract_modes, reweight_resample
from ealv_tpu.fingerprint.identify import (
    FingerprintSet,
    identify_step,
    relative_pose_beliefs,
    update_beliefs,
)
from ealv_tpu.models import CVAE


class TestLatentDistance:
    def _pair(self, rng):
        mu1 = rng.standard_normal((5, 8)).astype(np.float32)
        lv1 = rng.standard_normal((5, 8)).astype(np.float32) * 0.1
        mu2 = rng.standard_normal((5, 8)).astype(np.float32)
        lv2 = rng.standard_normal((5, 8)).astype(np.float32) * 0.1
        return map(jnp.asarray, (mu1, lv1, mu2, lv2))

    def test_l2(self, rng):
        mu1, lv1, mu2, lv2 = self._pair(rng)
        out = latent_distance("L2", mu1, lv1, mu2, lv2)
        np.testing.assert_allclose(
            out, jnp.sqrt(jnp.sum((mu1 - mu2) ** 2, 1)), rtol=1e-5
        )

    def test_kl_properties(self, rng):
        mu1, lv1, _, _ = self._pair(rng)
        # KL(N || N) = 0
        same = latent_distance("KL", mu1, lv1, mu1, lv1)
        np.testing.assert_allclose(same, 0.0, atol=1e-5)

    def test_bc_symmetry(self, rng):
        mu1, lv1, mu2, lv2 = self._pair(rng)
        a = latent_distance("BC", mu1, lv1, mu2, lv2)
        b = latent_distance("BC", mu2, lv2, mu1, lv1)
        np.testing.assert_allclose(a, b, rtol=1e-4)
        same = latent_distance("BC", mu1, lv1, mu1, lv1)
        np.testing.assert_allclose(same, 0.0, atol=1e-5)

    def test_unknown_raises(self, rng):
        mu1, lv1, mu2, lv2 = self._pair(rng)
        with pytest.raises(ValueError):
            latent_distance("nope", mu1, lv1, mu2, lv2)


class TestBelief:
    def test_fusion_concentrates(self):
        """Low-distance (good) measurements at one location must raise the
        belief there relative to elsewhere."""
        bel = FingerprintBelief.create("xy", [[-1, 1], [-1, 1]], num_samples=20,
                                       thresh=1.0, clip=2.0)
        loc = jnp.array([0.5, 0.5])
        upd = jax.jit(FingerprintBelief.update_prior)
        for _ in range(5):
            bel = bel.push(loc, jnp.asarray(0.1))  # small distance = good match
            bel = upd(bel)
        grid_pdf = np.asarray(bel.pdf_grid())
        g = np.asarray(bel.grid)
        near = np.linalg.norm(g - np.array([0.5, 0.5]), axis=1) < 0.2
        far = np.linalg.norm(g - np.array([-0.5, -0.5]), axis=1) < 0.2
        assert grid_pdf[near].mean() > grid_pdf[far].mean()

    def test_bad_measurements_lower_belief(self):
        bel = FingerprintBelief.create("xy", [[-1, 1], [-1, 1]], num_samples=20,
                                       thresh=1.0, clip=2.0)
        loc = jnp.array([0.0, 0.0])
        for _ in range(5):
            bel = bel.push(loc, jnp.asarray(1.9))  # large distance = bad match
            bel = bel.update_prior()
        grid_pdf = np.asarray(bel.pdf_grid())
        g = np.asarray(bel.grid)
        near = np.linalg.norm(g, axis=1) < 0.2
        assert grid_pdf[near].mean() < 0.5  # pushed below the uniform prior

    def test_update_clears_pending(self):
        bel = FingerprintBelief.create("xy", [[-1, 1], [-1, 1]], num_samples=10)
        bel = bel.push(jnp.zeros(2), jnp.asarray(0.5))
        bel = bel.update_prior()
        assert int(bel.meas_n) == 0 and int(bel.count) == 1

    def test_noop_without_measurements(self):
        bel = FingerprintBelief.create("xy", [[-1, 1], [-1, 1]], num_samples=10)
        bel2 = bel.update_prior()
        np.testing.assert_allclose(bel2.prior, bel.prior)

    def test_pdf_interpolation_matches_grid(self):
        bel = FingerprintBelief.create("xy", [[-1, 1], [-1, 1]], num_samples=20)
        for i in range(3):
            bel = bel.push(jnp.array([0.3, -0.2]), jnp.asarray(0.2))
        bel = bel.update_prior()
        # querying exactly at grid points must reproduce grid values
        q = bel.grid[::37]
        out = np.asarray(bel.pdf(q))
        want = np.asarray(bel.pdf_grid())[::37]
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)

    def test_invert(self):
        bel = FingerprintBelief.create("xy", [[-1, 1], [-1, 1]], num_samples=10,
                                       invert=True)
        bel = bel.push(jnp.array([0.0, 0.0]), jnp.asarray(0.1))
        bel = bel.update_prior()
        inv = np.asarray(bel.pdf_grid())
        raw = np.asarray(bel.pdf_grid(override_invert=True))
        np.testing.assert_allclose(inv, -raw + raw.max() + raw.min(), rtol=1e-5)

    def test_marginalize(self):
        p = np.arange(8.0)
        out = marginalize_angles(jnp.asarray(p), (2, 2, 2), (0, 1), "mean")
        assert out.shape == (2, 2)
        out_max = marginalize_angles(jnp.asarray(p), (2, 2, 2), (0, 1), "max")
        assert (np.asarray(out_max) >= np.asarray(out)).all()

    def test_capacity_guard_d4(self):
        # 50^4 cells x cap 64 would materialize a 1.6e9-element footprint in
        # update_prior; create must fail loudly with the documented knobs
        # (the reference stays at d<=3 and marginalizes angles, see
        # fingerprint_module.py:630-701) rather than let XLA OOM.
        lims4 = [[-1, 1]] * 4
        with pytest.raises(ValueError, match="marginalize_angles"):
            FingerprintBelief.create("xyzw", lims4, num_samples=50)
        # the suggested per-dim budget in the message must itself be valid
        try:
            FingerprintBelief.create("xyzw", lims4, num_samples=50)
        except ValueError as e:
            import re
            fit = int(re.search(r"num_samples<=(\d+)", str(e)).group(1))
        bel = FingerprintBelief.create("xyzw", lims4, num_samples=fit)
        assert bel.grid.shape == (fit ** 4, 4)
        # d=3 at the reference's 50 samples/dim stays allowed
        FingerprintBelief.create("xyw", [[-1, 1]] * 3, num_samples=50)


class TestClustering:
    def test_mean_shift_finds_two_modes(self, rng):
        a = rng.normal((-0.5, -0.5), 0.05, (60, 2))
        b = rng.normal((0.5, 0.5), 0.05, (60, 2))
        X = np.vstack([a, b]).astype(np.float32)
        shifted = mean_shift(jnp.asarray(X), bandwidth=0.3)
        means, labels = extract_modes(shifted, bandwidth=0.3)
        assert len(means) == 2
        centers = np.sort(means, axis=0)
        np.testing.assert_allclose(centers[0], [-0.5, -0.5], atol=0.1)
        np.testing.assert_allclose(centers[1], [0.5, 0.5], atol=0.1)
        assert (labels >= 0).sum() == 120

    def test_merge_overlapping(self):
        means = np.array([[0.0, 0.0], [0.1, 0.0], [1.0, 1.0]])
        labels = np.array([0, 1, 2, 0, 1, 2])
        m2, l2 = merge_overlapping(means, labels, sq_thresh=0.04)
        assert len(m2) == 2
        assert set(l2.tolist()) <= {-1, 0, 1}

    def test_reweight_resample_prefers_heavy(self, rng):
        samples = jnp.asarray(np.linspace(-1, 1, 100)[:, None].astype(np.float32))
        w = jnp.where(jnp.arange(100) > 50, 10.0, 0.01)
        out = reweight_resample(jax.random.PRNGKey(0), samples, w, 200)
        assert (np.asarray(out)[:, 0] > 0).mean() > 0.9

    def test_optimize_samples_stays_in_barrier(self):
        """Kernel-optimized samples must remain inside the workspace (the
        whole point of the barrier term, clustering.py:110-119)."""
        from ealv_tpu.control import setup_barrier
        from ealv_tpu.fingerprint import optimize_samples

        model = CVAE(img_dim=(16, 16, 3), z_dim=4, s_dim=2, hidden_dim=(32, 16),
                     cnn_kernels=(3,), cnn_strides=(2,), cnn_channels=(4,))
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key}, jnp.zeros((1, 2)),
                            jnp.zeros((1, 16, 16, 3)), train=False)
        seeds_x = jax.random.uniform(key, (2, 2), minval=-1, maxval=1)
        seeds_y = jax.random.uniform(key, (2, 16, 16, 3))
        barrier, _ = setup_barrier("xy", jnp.array([[-1.0, 1.0]] * 2),
                                   jnp.array([[-1.25, 1.25]] * 2), [0, 1])
        samples = jax.random.uniform(key, (100, 2), minval=-1, maxval=1)
        out = optimize_samples(model, params, seeds_x, seeds_y, samples,
                               barrier=barrier.truncate(2), iters=5)
        assert out.shape == samples.shape
        assert float(jnp.abs(out).max()) < 1.5  # no blow-up past the barrier
        assert not np.allclose(np.asarray(out), np.asarray(samples))  # moved

    def test_find_clusters_end_to_end(self):
        """Synthetic model-free check is impossible (scoring needs a model),
        so use a tiny CVAE: clusters should land where decoded variance is
        high — just verify the pipeline runs and produces sane output."""
        model = CVAE(img_dim=(16, 16, 3), z_dim=4, s_dim=2, hidden_dim=(32, 16),
                     cnn_kernels=(3,), cnn_strides=(2,), cnn_channels=(4,))
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key}, jnp.zeros((1, 2)),
                            jnp.zeros((1, 16, 16, 3)), train=False)
        seeds_x = jax.random.uniform(key, (3, 2), minval=-1, maxval=1)
        seeds_y = jax.random.uniform(key, (3, 16, 16, 3))
        res = find_clusters(model, params, seeds_x, seeds_y, key,
                            robot_lim=[[-1, 1], [-1, 1]], num_pts=200,
                            bandwidth=0.4)
        assert res.points.shape[1] == 2
        assert res.means.ndim == 2
        assert res.labels.shape[0] == 100


class TestIdentify:
    @pytest.fixture(scope="class")
    def setup(self):
        model = CVAE(img_dim=(16, 16, 3), z_dim=4, s_dim=2, hidden_dim=(32, 16),
                     cnn_kernels=(3,), cnn_strides=(2,), cnn_channels=(4,))
        key = jax.random.PRNGKey(0)
        params = model.init({"params": key}, jnp.zeros((1, 2)),
                            jnp.zeros((1, 16, 16, 3)), train=False)
        dicts = []
        for i in range(2):
            s = 5 + i  # different sample counts exercise padding
            dicts.append({
                "z_mu": np.random.default_rng(i).standard_normal((s, 4)).astype(np.float32),
                "z_var": np.full((s, 4), -1.0, np.float32),
                "x": np.random.default_rng(10 + i).uniform(-1, 1, (s, 2)).astype(np.float32),
                "center": np.array([0.3 * i, -0.3 * i], np.float32),
                "center_img": np.zeros((16, 16, 3), np.float32),
            })
        fps = FingerprintSet.from_lists(dicts)
        return model, params, fps

    def test_identify_shapes(self, setup):
        model, params, fps = setup
        test_y = jnp.zeros((16, 16, 3))
        dists, best = identify_step(model, params, fps, jnp.zeros(2), test_y)
        assert dists.shape == (2,) and best.shape == (2, 2)
        assert np.isfinite(np.asarray(dists)).all()

    def test_error_mode(self, setup):
        model, params, fps = setup
        dists, best = identify_step(model, params, fps, jnp.zeros(2),
                                    jnp.zeros((16, 16, 3)), error_mode=True)
        assert np.isfinite(np.asarray(dists)).all()

    def test_relative_pose_no_yaw(self):
        out = relative_pose_beliefs(
            "xy", jnp.array([0.5, 0.5]),
            jnp.array([[0.1, 0.1]]), jnp.array([[0.0, 0.0]]),
            robot_lim=[[-1, 1]] * 2, tray_lim=[[-1, 1]] * 2,
        )
        np.testing.assert_allclose(np.asarray(out), [[0.4, 0.4]], rtol=1e-5)

    def test_relative_pose_yaw_identity(self):
        """With identical yaw everywhere the composition reduces to the
        translation rule, and reflection duplicates rows."""
        rl = [[-1, 1]] * 3
        tl = [[-1, 1], [-1, 1], [-2, 2]]
        out = relative_pose_beliefs(
            "xyw", jnp.array([0.5, 0.5, 0.0]),
            jnp.array([[0.1, 0.1, 0.0]]), jnp.array([[0.0, 0.0, 0.0]]),
            robot_lim=rl, tray_lim=tl, reflect_w=True,
        )
        out = np.asarray(out)
        assert out.shape == (2, 3)
        np.testing.assert_allclose(out[0, :2], [0.4, 0.4], atol=1e-5)
        np.testing.assert_allclose(out[0, 2], 0.0, atol=1e-5)

    def test_relative_pose_yaw_rotation(self):
        """90-degree yaw difference rotates the center offset."""
        rl = [[-1, 1], [-1, 1], [-np.pi, np.pi]]
        tl = rl  # identity angle conversion
        test = jnp.array([0.0, 0.0, np.pi / 2])  # robot yawed 90deg vs fp capture
        fp = jnp.array([[0.2, 0.0, 0.0]])
        center = jnp.array([[0.0, 0.0, 0.0]])
        out = np.asarray(relative_pose_beliefs(
            "xyw", test, fp, center, rl, tl, reflect_w=False))
        # diff = center - fp = (-0.2, 0); R_fp^T R_test = Rz(90deg);
        # rotated -> (0, -0.2); belief = test_xy + rotated
        np.testing.assert_allclose(out[0, :2], [0.0, -0.2], atol=1e-5)

    def test_update_beliefs_pipeline(self, setup):
        model, params, fps = setup
        beliefs = [
            FingerprintBelief.create("xy", [[-1, 1], [-1, 1]], num_samples=10)
            for _ in range(2)
        ]
        new, dists = update_beliefs(
            model, params, fps, beliefs,
            test_state=jnp.array([0.2, 0.2]), test_y=jnp.zeros((16, 16, 3)),
            states="xy", robot_lim=[[-1, 1]] * 2, tray_lim=[[-1, 1]] * 2,
        )
        assert len(new) == 2
        assert all(int(b.count) == 1 for b in new)


class TestArtifactIO:
    def test_fingerprint_roundtrip(self, tmp_path, rng):
        from ealv_tpu.fingerprint import save_fingerprint, load_fingerprints
        from ealv_tpu.fingerprint.identify import FingerprintSet

        fp = {
            "z_mu": rng.standard_normal((5, 4)).astype(np.float32),
            "z_var": rng.standard_normal((5, 4)).astype(np.float32),
            "x": rng.uniform(-1, 1, (5, 2)).astype(np.float32),
            "center": np.array([0.1, -0.2], np.float32),
            "center_img": rng.uniform(0, 1, (8, 8, 3)).astype(np.float32),
        }
        save_fingerprint(str(tmp_path / "fp0"), fp)
        save_fingerprint(str(tmp_path / "fp1.npz"), fp)
        loaded = load_fingerprints(str(tmp_path))
        assert len(loaded) == 2
        np.testing.assert_allclose(loaded[0]["z_mu"], fp["z_mu"])
        FingerprintSet.from_lists(loaded)  # pipes into identification

    def test_reference_pickle_import(self, tmp_path, rng):
        """Reference-format pickles (build_fingerprints:327-337) load into
        the same pipeline: z_var there is the VARIANCE
        (fingerprint_builder.py:93-94) -> our logvar convention, and a
        channel-first center_img transposes to (H, W, C)."""
        import pickle

        from ealv_tpu.fingerprint import load_fingerprints
        from ealv_tpu.fingerprint.identify import FingerprintSet

        logvar = rng.uniform(-3, 1, (5, 4)).astype(np.float32)
        ref_fp = {
            "z_mu": rng.standard_normal((5, 4)).astype(np.float32),
            "z_var": np.exp(logvar),  # the reference stores exp(z_logvar)
            "x": rng.uniform(-1, 1, (5, 2)).astype(np.float32),
            "center": np.array([0.1, -0.2], np.float32),
            "center_img": rng.uniform(0, 1, (3, 8, 8)).astype(np.float32),
            "force": rng.standard_normal((5, 1)).astype(np.float32),
        }
        with open(tmp_path / "duck_entklerg.pickle", "wb") as f:
            pickle.dump(ref_fp, f)
        loaded = load_fingerprints(str(tmp_path))
        assert len(loaded) == 1
        np.testing.assert_allclose(loaded[0]["z_var"], logvar, atol=1e-5)
        np.testing.assert_allclose(loaded[0]["z_mu"], ref_fp["z_mu"])
        assert loaded[0]["center_img"].shape == (8, 8, 3)
        assert "force" in loaded[0]
        fps = FingerprintSet.from_lists(loaded)  # pipes into identification
        np.testing.assert_allclose(np.asarray(fps.z_logvar[0]), logvar,
                                   atol=1e-5)

    def test_directory_mode_skips_non_fingerprint_pickles(self, tmp_path, rng):
        """Reference run dirs also hold belief snapshots (string fields,
        fingerprint_module.py:537), explr_update_info.pickle, and
        ergodic_cost.pickle — directory mode must skip those with a warning
        instead of crashing, while an explicit path still fails loudly."""
        import pickle

        from ealv_tpu.fingerprint import load_fingerprints

        good = {
            "z_mu": rng.standard_normal((5, 4)).astype(np.float32),
            "z_var": np.exp(rng.uniform(-3, 1, (5, 4))).astype(np.float32),
            "x": rng.uniform(-1, 1, (5, 2)).astype(np.float32),
            "center": np.array([0.1, -0.2], np.float32),
            "center_img": rng.uniform(0, 1, (3, 8, 8)).astype(np.float32),
        }
        belief_snapshot = {"name": "duck", "states": "xy",
                           "prior": np.zeros((4, 4), np.float32)}
        with open(tmp_path / "duck_entklerg.pickle", "wb") as f:
            pickle.dump(good, f)
        with open(tmp_path / "duck_belief_0_0_0_10.pickle", "wb") as f:
            pickle.dump(belief_snapshot, f)
        with open(tmp_path / "ergodic_cost.pickle", "wb") as f:
            pickle.dump(np.zeros(7, np.float32), f)
        with pytest.warns(UserWarning, match="skipping"):
            loaded = load_fingerprints(str(tmp_path))
        assert len(loaded) == 1
        np.testing.assert_allclose(loaded[0]["z_mu"], good["z_mu"])
        # explicit path -> loud failure, no silent skip
        with pytest.raises(KeyError):
            load_fingerprints([str(tmp_path / "duck_belief_0_0_0_10.pickle")])

    def test_pickle_loader_refuses_code_execution(self, tmp_path):
        """The migration seam uses a numpy-only restricted unpickler: a
        pickle that smuggles an arbitrary callable (the classic os.system
        reduce) must be refused, not executed."""
        import os
        import pickle

        from ealv_tpu.fingerprint import load_fingerprints

        class Evil:
            def __reduce__(self):
                return (os.system, ("true",))

        with open(tmp_path / "evil.pickle", "wb") as f:
            pickle.dump({"z_mu": Evil()}, f)
        with pytest.raises(pickle.UnpicklingError, match="refusing"):
            load_fingerprints([str(tmp_path / "evil.pickle")])

    def test_belief_roundtrip(self, tmp_path):
        from ealv_tpu.fingerprint import (FingerprintBelief, save_beliefs,
                                          load_beliefs)

        b = FingerprintBelief.create("xy", [[-1, 1], [-1, 1]], num_samples=12)
        b = b.push(jnp.array([0.3, 0.3]), jnp.asarray(0.2)).update_prior()
        path = save_beliefs(str(tmp_path / "beliefs"), [b, b], names=["a", "b"])
        loaded, names = load_beliefs(path, "xy")
        assert names == ["a", "b"]
        np.testing.assert_allclose(np.asarray(loaded[0].prior),
                                   np.asarray(b.prior), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(loaded[0].grid),
                                   np.asarray(b.grid), rtol=1e-6)
        assert int(loaded[0].count) == 1
        # rebuilt belief still updates
        b2 = loaded[0].push(jnp.array([0.1, 0.1]), jnp.asarray(0.5)).update_prior()
        assert int(b2.count) == 2


class TestCalibration:
    def test_calibrate_thresholds(self, rng):
        from ealv_tpu.fingerprint import calibrate_thresholds
        dicts = []
        for i in range(2):
            dicts.append({
                "z_mu": (rng.standard_normal((6, 4)) + 3 * i).astype(np.float32),
                "z_var": np.full((6, 4), -1.0, np.float32),
                "x": rng.uniform(-1, 1, (6, 2)).astype(np.float32),
                "center": np.zeros(2, np.float32),
                "center_img": np.zeros((8, 8, 3), np.float32),
            })
        fps = FingerprintSet.from_lists(dicts)
        thresh, clip = calibrate_thresholds(fps, "L2")
        assert 0 < thresh < clip
        # well-separated clusters: min cross distance is substantial
        assert thresh > 1.0

    def test_single_fingerprint_fallback(self, rng):
        from ealv_tpu.fingerprint import calibrate_thresholds
        d = {
            "z_mu": rng.standard_normal((5, 4)).astype(np.float32),
            "z_var": np.full((5, 4), -1.0, np.float32),
            "x": rng.uniform(-1, 1, (5, 2)).astype(np.float32),
            "center": np.zeros(2, np.float32),
            "center_img": np.zeros((8, 8, 3), np.float32),
        }
        fps = FingerprintSet.from_lists([d])
        thresh, clip = calibrate_thresholds(fps, "L2")
        assert 0 < thresh < clip
