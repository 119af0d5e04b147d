"""Checkpoint-migration parity: reference torch state_dict -> flax CVAE.

Builds the ACTUAL reference model (vae/vae.py, vae/vae_force.py) from
/root/reference, converts its randomly-initialized state_dict with
ealv_tpu.utils.torch_import, and asserts the two stacks produce the same
forward outputs on the same inputs — the end-to-end proof that a user's
CPU-trained reference checkpoint carries over to this framework.
"""

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/franka_test/scripts"
if not os.path.isdir(REF):
    pytest.skip("reference not mounted", allow_module_level=True)
if REF not in sys.path:
    sys.path.insert(0, REF)
np.product = np.prod  # reference uses the removed numpy alias
for _missing in ("numa", "faster_fifo", "rospy", "pyqtgraph"):
    sys.modules.setdefault(_missing, types.ModuleType(_missing))

import jax
import jax.numpy as jnp

from ealv_tpu.models import CVAE
from ealv_tpu.models.cvae import update_dist
from ealv_tpu.utils.torch_import import convert_state_dict, unwrap_checkpoint

# small but representative geometry: uneven image, 2-layer conv stack with
# a nonzero output_padding in the transposed decoder, distinct hidden dims
IMG_HW = (26, 26)
CNN = {"kernel_size": [3, 3], "stride": [2, 2], "channels": [4, 6]}
HIDDEN = [32, 16]
Z, S = 8, 3


def _ref_model(learn_force=False):
    if learn_force:
        from vae.vae_force import VAE as RefVAE
    else:
        from vae.vae import VAE as RefVAE
    m = RefVAE(
        img_dim=(3, *IMG_HW), z_dim=Z, s_dim=S, hidden_dim=list(HIDDEN),
        y_logvar_dim=1, CNNdict={k: list(v) for k, v in CNN.items()},
    )
    m.eval()
    return m


def _our_model(learn_force=False):
    return CVAE(
        img_dim=(*IMG_HW, 3), z_dim=Z, s_dim=S, hidden_dim=tuple(HIDDEN),
        cnn_kernels=tuple(CNN["kernel_size"]),
        cnn_strides=tuple(CNN["stride"]),
        cnn_channels=tuple(CNN["channels"]),
        learn_force=learn_force,
    )


def _inputs(rng, b=4):
    x = rng.standard_normal((b, S)).astype(np.float32)
    y = rng.random((b, 3, *IMG_HW)).astype(np.float32)
    f = rng.standard_normal((b, 1)).astype(np.float32)
    return x, y, f


class TestConvertRGB:
    def test_forward_parity(self):
        rng = np.random.default_rng(0)
        ref = _ref_model()
        x, y, _ = _inputs(rng)

        with torch.no_grad():
            img_pred, img_logvar, z_mu, z_logvar, z, _, _ = ref(
                torch.tensor(x), torch.tensor(y))

        model = _our_model()
        variables, _ = convert_state_dict(ref.state_dict(), model)
        out = model.apply(variables, jnp.asarray(x),
                          jnp.asarray(y.transpose(0, 2, 3, 1)), train=False)

        np.testing.assert_allclose(out["z_mu"], z_mu.numpy(),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(out["z_logvar"], z_logvar.numpy(),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["img_pred"]).transpose(0, 3, 1, 2),
            img_pred.numpy(), rtol=0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out["img_logvar"]).ravel(),
                                   img_logvar.numpy().ravel(),
                                   rtol=0, atol=1e-5)

    def test_cross_decode_parity(self):
        rng = np.random.default_rng(1)
        ref = _ref_model()
        x, y, _ = _inputs(rng)
        x2 = rng.standard_normal(x.shape).astype(np.float32)

        with torch.no_grad():
            *_, img_pred2, img_logvar2 = ref(
                torch.tensor(x), torch.tensor(y), x_decode=torch.tensor(x2))

        model = _our_model()
        variables, _ = convert_state_dict(ref.state_dict(), model)
        out = model.apply(variables, jnp.asarray(x),
                          jnp.asarray(y.transpose(0, 2, 3, 1)),
                          x_decode=jnp.asarray(x2), train=False)
        np.testing.assert_allclose(
            np.asarray(out["img_pred_decode"]).transpose(0, 3, 1, 2),
            img_pred2.numpy(), rtol=0, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(out["img_logvar_decode"]).ravel(),
            img_logvar2.numpy().ravel(), rtol=0, atol=1e-5)

    def test_pdf_parity_after_update_dist(self):
        """The converted params drive the SAME uncertainty target the torch
        stack would: seed via update_dist, compare pdf over a pose grid
        (pdf_torch vae.py:244-275)."""
        rng = np.random.default_rng(2)
        ref = _ref_model()
        x, y, _ = _inputs(rng, b=1)

        with torch.no_grad():
            ref.update_dist(torch.tensor(x), torch.tensor(y))
            samples = rng.uniform(-1, 1, (50, S)).astype(np.float32)
            ref_pdf = ref.pdf_torch(torch.tensor(samples)).numpy()

        model = _our_model()
        variables, mstate0 = convert_state_dict(ref.state_dict(), model)
        # the converter also carries the seeds; update_dist from the same
        # sample must agree with them
        mstate, _ = update_dist(model, variables, mstate0,
                                jnp.asarray(x[0]),
                                jnp.asarray(y[0].transpose(1, 2, 0)))
        np.testing.assert_allclose(mstate.z, mstate0.z, rtol=0, atol=1e-5)
        ours = model.apply(variables, mstate, jnp.asarray(samples),
                           method=CVAE.pdf)
        np.testing.assert_allclose(np.asarray(ours), ref_pdf.ravel(),
                                   rtol=1e-4, atol=1e-6)

    def test_buffer_import(self):
        rng = np.random.default_rng(3)
        ref = _ref_model()
        x, y, _ = _inputs(rng, b=1)
        with torch.no_grad():
            ref.update_dist(torch.tensor(x), torch.tensor(y))
        model = _our_model()
        _, mstate = convert_state_dict(ref.state_dict(), model)
        assert bool(mstate.initialized)
        np.testing.assert_allclose(mstate.seed_x, x[0], atol=1e-6)
        np.testing.assert_allclose(np.asarray(mstate.seed_y),
                                   y[0].transpose(1, 2, 0), atol=1e-6)
        np.testing.assert_allclose(
            mstate.z, ref.z_samples[0].numpy(), atol=1e-6)

    def test_buffer_import_non_square(self):
        """Non-square frames (reference allows any --image-dim) must come
        through unscrambled: the torch buffer is (1, C, H, W), so the CHW
        reshape target is (C, H, W), not reversed(img_dim) = (C, W, H)."""
        rng = np.random.default_rng(5)
        hw = (26, 22)
        from vae.vae import VAE as RefVAE
        ref = RefVAE(
            img_dim=(3, *hw), z_dim=Z, s_dim=S, hidden_dim=list(HIDDEN),
            y_logvar_dim=1, CNNdict={k: list(v) for k, v in CNN.items()},
        )
        ref.eval()
        x = rng.standard_normal((1, S)).astype(np.float32)
        y = rng.random((1, 3, *hw)).astype(np.float32)
        with torch.no_grad():
            ref.update_dist(torch.tensor(x), torch.tensor(y))
        model = CVAE(
            img_dim=(*hw, 3), z_dim=Z, s_dim=S, hidden_dim=tuple(HIDDEN),
            cnn_kernels=tuple(CNN["kernel_size"]),
            cnn_strides=tuple(CNN["stride"]),
            cnn_channels=tuple(CNN["channels"]),
        )
        _, mstate = convert_state_dict(ref.state_dict(), model)
        assert mstate.seed_y.shape == (*hw, 3)
        np.testing.assert_allclose(np.asarray(mstate.seed_y),
                                   y[0].transpose(1, 2, 0), atol=1e-6)

    def test_fresh_state_dict_not_initialized(self):
        ref = _ref_model()
        model = _our_model()
        _, mstate = convert_state_dict(ref.state_dict(), model)
        assert not bool(mstate.initialized)


class TestConvertForce:
    def test_forward_parity(self):
        rng = np.random.default_rng(4)
        ref = _ref_model(learn_force=True)
        x, y, f = _inputs(rng)

        with torch.no_grad():
            (img_pred, img_logvar, z_mu, z_logvar, z, force_pred,
             force_logvar, *_) = ref(torch.tensor(x), torch.tensor(y),
                                     torch.tensor(f))

        model = _our_model(learn_force=True)
        variables, _ = convert_state_dict(ref.state_dict(), model)
        out = model.apply(variables, jnp.asarray(x),
                          jnp.asarray(y.transpose(0, 2, 3, 1)),
                          force=jnp.asarray(f), train=False)
        np.testing.assert_allclose(out["z_mu"], z_mu.numpy(),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(out["force_pred"], force_pred.numpy(),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["img_pred"]).transpose(0, 3, 1, 2),
            img_pred.numpy(), rtol=0, atol=1e-4)


@pytest.mark.slow
class TestImportCLI:
    def test_roundtrip_with_verify(self, tmp_path):
        """scripts/import_torch_checkpoint.py end-to-end: save a reference
        state_dict as .pth, convert with --verify (cross-checks vs the
        torch forward in the child), load back, and match outputs here."""
        import subprocess

        rng = np.random.default_rng(5)
        ref = _ref_model()
        x, y, _ = _inputs(rng, b=1)
        with torch.no_grad():
            ref.update_dist(torch.tensor(x), torch.tensor(y))
        pth = tmp_path / "model_final.pth"
        torch.save(ref.state_dict(), pth)

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        script = os.path.join(repo, "scripts", "import_torch_checkpoint.py")
        out = tmp_path / "imported"
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = ""  # child re-pins via its own config
        argv = [script, str(pth), "--out", str(out), "--verify",
                "--image-dim", "3", str(IMG_HW[0]), str(IMG_HW[1]),
                "--z-dim", str(Z), "--s-dim", str(S),
                "--hidden", *map(str, HIDDEN),
                "--kernels", *map(str, CNN["kernel_size"]),
                "--strides", *map(str, CNN["stride"]),
                "--channels", *map(str, CNN["channels"])]
        # force CPU in the child (tests must not require the real chip)
        code = (
            "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
            f"sys.argv = {argv!r}; __file__ = sys.argv[0]; "
            "exec(compile(open(sys.argv[0]).read(), sys.argv[0], 'exec'))"
        )
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=600,
                           env=env, cwd=repo)
        assert r.returncode == 0, r.stderr[-2000:]
        assert "verify ok" in r.stdout

        sys.path.insert(0, repo)
        from scripts.import_torch_checkpoint import load_imported

        model, variables, mstate = load_imported(str(out))
        assert bool(mstate.initialized)
        with torch.no_grad():
            ref_out = ref(torch.tensor(x), torch.tensor(y))
        out_j = model.apply(variables, jnp.asarray(x),
                            jnp.asarray(y.transpose(0, 2, 3, 1)), train=False)
        np.testing.assert_allclose(out_j["z_mu"], ref_out[2].numpy(),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(mstate.seed_x), x[0], atol=1e-6)


class TestWrappersAndErrors:
    def test_unwrap_variants(self):
        ref = _ref_model()
        sd = ref.state_dict()
        ddp = {"module." + k: v for k, v in sd.items()}
        for wrapped in (sd, {"state_dict": sd, "optimizer": None},
                        {"model": sd, "learning_ind": 3}, ddp):
            out = unwrap_checkpoint(wrapped)
            assert set(out) == set(sd)

    def test_config_mismatch_fails_loudly(self):
        ref = _ref_model()
        bad = CVAE(
            img_dim=(*IMG_HW, 3), z_dim=Z + 1, s_dim=S,
            hidden_dim=tuple(HIDDEN),
            cnn_kernels=tuple(CNN["kernel_size"]),
            cnn_strides=tuple(CNN["stride"]),
            cnn_channels=tuple(CNN["channels"]),
        )
        with pytest.raises(ValueError):
            convert_state_dict(ref.state_dict(), bad)

    def test_wrong_depth_fails_loudly(self):
        ref = _ref_model()
        bad = CVAE(
            img_dim=(*IMG_HW, 3), z_dim=Z, s_dim=S, hidden_dim=(32,),
            cnn_kernels=tuple(CNN["kernel_size"]),
            cnn_strides=tuple(CNN["stride"]),
            cnn_channels=tuple(CNN["channels"]),
        )
        with pytest.raises(ValueError):
            convert_state_dict(ref.state_dict(), bad)
