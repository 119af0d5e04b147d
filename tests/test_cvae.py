import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealv_tpu.models import CVAE, conv_output_dims, gaussian_nll, kl_divergence, cvae_loss
from ealv_tpu.models.cvae import init_model_state, update_dist


def small_model(**kw):
    defaults = dict(
        img_dim=(45, 45, 3), z_dim=6, s_dim=2, hidden_dim=(32, 16),
        cnn_kernels=(5, 5), cnn_strides=(3, 2), cnn_channels=(10, 10),
    )
    defaults.update(kw)
    return CVAE(**defaults)


@pytest.fixture(scope="module")
def model_and_params():
    model = small_model()
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 2)), jnp.zeros((1, 45, 45, 3)), train=False,
    )
    return model, params


@pytest.mark.slow
class TestShapes:
    def test_conv_output_dims(self):
        # reference config: 180x180, k=[3,3,5], s=[2,2,3] -> 14x14
        (h, w), dims = conv_output_dims((180, 180), (3, 3, 5), (2, 2, 3))
        assert (h, w) == (14, 14)
        assert dims[0] == (180, 180)

    def test_forward_shapes(self, model_and_params):
        model, params = model_and_params
        x = jnp.zeros((4, 2))
        y = jnp.zeros((4, 45, 45, 3))
        out = model.apply(params, x, y, train=False)
        assert out["img_pred"].shape == (4, 45, 45, 3)
        assert out["z_mu"].shape == (4, 6)
        assert out["z_logvar"].shape == (4, 6)
        assert out["img_logvar"].shape == (4, 1)

    def test_odd_image_size_reconstruction_shape(self):
        # 38x38 exercises the output_padding path (vae.py:60 comment)
        model = small_model(img_dim=(38, 38, 3), cnn_kernels=(5, 5), cnn_strides=(3, 2))
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 2)), jnp.zeros((1, 38, 38, 3)), train=False,
        )
        out = model.apply(params, jnp.zeros((2, 2)), jnp.zeros((2, 38, 38, 3)), train=False)
        assert out["img_pred"].shape == (2, 38, 38, 3)

    def test_cross_decode(self, model_and_params):
        model, params = model_and_params
        out = model.apply(
            params, jnp.zeros((3, 2)), jnp.zeros((3, 45, 45, 3)),
            x_decode=jnp.ones((3, 2)), train=False,
        )
        assert out["img_pred_decode"].shape == (3, 45, 45, 3)

    def test_force_variant(self):
        model = small_model(learn_force=True)
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 2)), jnp.zeros((1, 45, 45, 3)),
            force=jnp.zeros((1, 1)), train=False,
        )
        out = model.apply(
            params, jnp.zeros((2, 2)), jnp.zeros((2, 45, 45, 3)),
            force=jnp.zeros((2, 1)), train=False,
        )
        assert out["force_pred"].shape == (2, 1)
        # combo var: force logvar is the image logvar (vae_force.py:159-161)
        np.testing.assert_allclose(out["force_logvar"], out["img_logvar"])


class TestDistribution:
    def test_pdf_uniform_before_init(self, model_and_params):
        model, params = model_and_params
        state = init_model_state(model)
        samples = jax.random.uniform(jax.random.PRNGKey(1), (50, 2), minval=-1, maxval=1)
        p = model.apply(params, state, samples, method=CVAE.pdf)
        np.testing.assert_allclose(p, 1.0)

    def test_pdf_after_update_dist(self, model_and_params):
        model, params = model_and_params
        state = init_model_state(model)
        x = jnp.array([0.2, -0.3])
        y = jax.random.uniform(jax.random.PRNGKey(2), (45, 45, 3))
        state, out = update_dist(model, params, state, x, y)
        assert bool(state.initialized)
        np.testing.assert_allclose(state.z, out["z"][0])
        samples = jax.random.uniform(jax.random.PRNGKey(3), (50, 2), minval=-1, maxval=1)
        p = np.asarray(model.apply(params, state, samples, method=CVAE.pdf))
        assert p.shape == (50,)
        assert (p > 0).all() and p.std() > 0  # non-degenerate uncertainty

    def test_pdf_matches_forward_logvar(self, model_and_params):
        """pdf at the seed pose must equal exp(img_logvar) of a decode with
        the same z — the chunk decoder sanity check (vae.py:235) as a test."""
        model, params = model_and_params
        state = init_model_state(model)
        x = jnp.array([0.1, 0.1])
        y = jax.random.uniform(jax.random.PRNGKey(4), (45, 45, 3))
        state, _ = update_dist(model, params, state, x, y)
        p = model.apply(params, state, x[None], method=CVAE.pdf)
        y_logvar, _ = model.apply(params, state, x[None], method=CVAE.decode_samples)
        np.testing.assert_allclose(p[0], np.exp(y_logvar[0, 0]), rtol=1e-5)

    def test_z_ensemble(self, model_and_params):
        model, params = model_and_params
        state = init_model_state(model)
        key = jax.random.PRNGKey(5)
        for i in range(3):
            x = jax.random.uniform(jax.random.fold_in(key, i), (2,), minval=-1, maxval=1)
            y = jax.random.uniform(jax.random.fold_in(key, 10 + i), (45, 45, 3))
            state, _ = update_dist(model, params, state, x, y)
        samples = jax.random.uniform(key, (20, 2), minval=-1, maxval=1)
        p_ens = model.apply(params, state, samples, use_z_ensemble=True, method=CVAE.pdf)
        p_one = model.apply(params, state, samples, method=CVAE.pdf)
        assert p_ens.shape == p_one.shape
        assert not np.allclose(p_ens, p_one)  # ensemble actually differs

    def test_dx_mode_shifts_samples(self):
        model = small_model(dx=True)
        params = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 2)), jnp.zeros((1, 45, 45, 3)), train=False,
        )
        state = init_model_state(model)
        x = jnp.array([0.5, 0.5])
        y = jnp.ones((45, 45, 3)) * 0.3
        state, _ = update_dist(model, params, state, x, y)
        # decoding at the seed pose in dx mode = decoding offset 0
        lv_seed, _ = model.apply(params, state, x[None], method=CVAE.decode_samples)
        state0 = state._replace(seed_x=jnp.zeros(2))
        lv_zero, _ = model.apply(params, state0, jnp.zeros((1, 2)), method=CVAE.decode_samples)
        np.testing.assert_allclose(lv_seed, lv_zero, rtol=1e-5)


class TestLosses:
    def test_gaussian_nll_reference_formula(self, rng):
        y = rng.standard_normal((4, 5, 5, 3)).astype(np.float32)
        yp = rng.standard_normal((4, 5, 5, 3)).astype(np.float32)
        lv = rng.standard_normal((4, 1)).astype(np.float32)
        got = float(gaussian_nll(jnp.array(y), jnp.array(yp), jnp.array(lv)))
        lv_b = np.broadcast_to(lv.reshape(4, 1, 1, 1), y.shape)
        var = np.exp(lv_b) ** 2
        log_prob = -((y - yp) ** 2) / (2 * var) - lv_b - np.log(np.sqrt(2 * np.pi))
        np.testing.assert_allclose(got, -log_prob.mean(), rtol=1e-5)

    def test_kl_zero_at_prior(self):
        z = jnp.zeros((8, 6))
        np.testing.assert_allclose(float(kl_divergence(z, z)), 0.0, atol=1e-7)

    def test_full_objective_weights(self, model_and_params, rng):
        model, params = model_and_params
        x = jnp.array(rng.uniform(-1, 1, (4, 2)).astype(np.float32))
        y = jnp.array(rng.uniform(0, 1, (4, 45, 45, 3)).astype(np.float32))
        x2 = jnp.array(rng.uniform(-1, 1, (4, 2)).astype(np.float32))
        y2 = jnp.array(rng.uniform(0, 1, (4, 45, 45, 3)).astype(np.float32))
        out = model.apply(params, x, y, x_decode=x2, train=False)
        loss, m = cvae_loss(out, y, y2=y2, beta=0.05, gamma=1.0, gamma_weight=0.1,
                            other_locs=True)
        np.testing.assert_allclose(
            float(loss),
            float(m["rc"] + 0.05 * m["kl"] + 0.1 * 1.0 * m["rc_other"]),
            rtol=1e-5,
        )

    def test_training_reduces_loss(self, model_and_params, rng):
        """A few Adam steps on a fixed batch must reduce the loss — the
        smallest end-to-end learning check."""
        import optax
        model, params = model_and_params
        x = jnp.array(rng.uniform(-1, 1, (8, 2)).astype(np.float32))
        y = jnp.array(rng.uniform(0, 1, (8, 45, 45, 3)).astype(np.float32))
        opt = optax.adam(1e-3)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                out = model.apply(p, x, y, train=True, rngs={"reparam": key})
                return cvae_loss(out, y, beta=0.01)[0]
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        losses = []
        p = params
        for i in range(30):
            p, opt_state, loss = step(p, opt_state, jax.random.PRNGKey(i))
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 0.1


@pytest.mark.slow
class TestDecoderModes:
    def test_resize_conv_variant(self):
        """The resize_conv decoder family (perf/quality alternative) keeps
        shapes and trains; conv_transpose stays the parity default."""
        model = small_model(decoder_mode="resize_conv")
        params = model.init({"params": jax.random.PRNGKey(0)},
                            jnp.zeros((1, 2)), jnp.zeros((1, 45, 45, 3)),
                            train=False)
        out = model.apply(params, jnp.zeros((2, 2)), jnp.zeros((2, 45, 45, 3)),
                          train=False)
        assert out["img_pred"].shape == (2, 45, 45, 3)

    def test_unknown_mode_raises(self):
        import pytest
        model = small_model(decoder_mode="bogus")
        with pytest.raises(ValueError):
            model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 2)), jnp.zeros((1, 45, 45, 3)), train=False)

    def test_subpixel_exactness(self, rng):
        """subpixel_conv_transpose must equal flax ConvTranspose bit-for-bit
        (up to f32 reassociation) for all decoder shapes in use."""
        from flax import linen as nn
        from ealv_tpu.models.subpixel import subpixel_conv_transpose

        for (h, k, s, cin, cout) in [(14, 5, 3, 20, 10), (44, 3, 2, 10, 10),
                                     (7, 4, 2, 3, 5)]:
            x = jnp.asarray(rng.standard_normal((2, h, h, cin)).astype(np.float32))
            W = jnp.asarray(rng.standard_normal((k, k, cin, cout)).astype(np.float32))
            ref = nn.ConvTranspose(cout, (k, k), strides=(s, s), padding="VALID",
                                   use_bias=False).apply({"params": {"kernel": W}}, x)
            got = subpixel_conv_transpose(x, W, s)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)
            from ealv_tpu.models.subpixel import subpixel_conv_transpose_d2s
            got2 = subpixel_conv_transpose_d2s(x, W, s)
            np.testing.assert_allclose(np.asarray(got2), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)


class TestLanePad:
    """Lane-packed conv layouts (VERDICT r4 #3): lane_pad computes every
    conv on channel dims zero-padded to a lane multiple with the SAME
    parameters and math (models/cvae.py _LanePadConv). Padding with exact
    zeros cannot change any f32 sum, so forward AND gradients must match
    the native model on identical params."""

    @pytest.mark.slow
    @pytest.mark.parametrize("lane", [8, 32])
    def test_forward_and_grads_match_native(self, lane):
        kw = dict(img_dim=(45, 45, 3), z_dim=6, s_dim=2, hidden_dim=(32, 16),
                  cnn_kernels=(5, 5), cnn_strides=(3, 2),
                  cnn_channels=(10, 10), learn_force=True)
        m0, m1 = CVAE(**kw), CVAE(**kw, lane_pad=lane)
        key = jax.random.PRNGKey(0)
        x = jax.random.uniform(jax.random.PRNGKey(1), (3, 2), minval=-1,
                               maxval=1)
        y = jax.random.uniform(jax.random.PRNGKey(2), (3, 45, 45, 3))
        f = jax.random.uniform(jax.random.PRNGKey(3), (3, 1))
        p0 = m0.init({"params": key}, x, y, f, train=False)
        p1 = m1.init({"params": key}, x, y, f, train=False)
        assert jax.tree.all(jax.tree.map(lambda a, b: a.shape == b.shape,
                                         p0, p1))

        def run(m, p):
            return m.apply(p, x, y, f, train=False, rngs={"reparam": key})

        for a, b in zip(jax.tree.leaves(run(m0, p0)),
                        jax.tree.leaves(run(m1, p0))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)

        def loss(m):
            return lambda p: sum(
                jnp.sum(l.astype(jnp.float32) ** 2)
                for l in jax.tree.leaves(run(m, p)))

        for a, b in zip(jax.tree.leaves(jax.grad(loss(m0))(p0)),
                        jax.tree.leaves(jax.grad(loss(m1))(p0))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)
