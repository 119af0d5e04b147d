import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ealv_tpu.ops import (
    traj_footprint,
    traj_spread,
    kldiv_grad,
    renormalize,
    cost_norm,
    psi_matrix,
)
from ealv_tpu.ops.pallas_kernels import footprint_and_spread


def _naive_psi(samples, traj, std):
    """Direct broadcast form, mirrors the reference math exactly."""
    inner = np.square(traj[None, :, :] - samples[:, None, :]) / np.abs(std)
    return np.exp(-0.5 * inner.sum(-1))


class TestFootprint:
    def test_matches_naive(self, rng):
        samples = rng.uniform(-1, 1, (37, 4)).astype(np.float32)
        traj = rng.uniform(-1, 1, (21, 4)).astype(np.float32)
        std = np.array([0.05, 0.05, 0.25, 0.25], np.float32)
        psi = _naive_psi(samples, traj, std)
        got = traj_footprint(jnp.array(traj), jnp.array(samples), jnp.arange(4), jnp.array(std))
        np.testing.assert_allclose(got, psi.sum(1), rtol=2e-4, atol=1e-5)
        got_max = traj_spread(jnp.array(traj), jnp.array(samples), jnp.arange(4), jnp.array(std))
        np.testing.assert_allclose(got_max, psi.max(1), rtol=2e-4, atol=1e-5)

    def test_explr_idx_subset(self, rng):
        # trajectory rows are full states; only explr_idx columns count
        samples = rng.uniform(-1, 1, (10, 2)).astype(np.float32)
        traj_full = rng.uniform(-1, 1, (15, 4)).astype(np.float32)
        std = np.array([0.1, 0.1], np.float32)
        got = traj_footprint(
            jnp.array(traj_full), jnp.array(samples), jnp.array([0, 1]), jnp.array(std)
        )
        want = _naive_psi(samples, traj_full[:, :2], std).sum(1)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_mask_equals_truncation(self, rng):
        samples = rng.uniform(-1, 1, (12, 3)).astype(np.float32)
        traj = rng.uniform(-1, 1, (30, 3)).astype(np.float32)
        std = np.full(3, 0.07, np.float32)
        mask = np.zeros(30, np.float32)
        mask[:11] = 1.0
        got = traj_footprint(
            jnp.array(traj), jnp.array(samples), jnp.arange(3), jnp.array(std),
            traj_mask=jnp.array(mask),
        )
        want = _naive_psi(samples, traj[:11], std).sum(1)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)

    def test_nu_scaling(self, rng):
        samples = rng.uniform(-1, 1, (5, 2)).astype(np.float32)
        traj = rng.uniform(-1, 1, (7, 2)).astype(np.float32)
        std = np.full(2, 0.1, np.float32)
        a = traj_footprint(jnp.array(traj), jnp.array(samples), jnp.arange(2), jnp.array(std), nu=2.0)
        b = traj_footprint(jnp.array(traj), jnp.array(samples), jnp.arange(2), jnp.array(std), nu=1.0)
        np.testing.assert_allclose(np.asarray(a) * 2, b, rtol=1e-5)


class TestPallasFootprint:
    def test_matches_xla(self, rng):
        n, t, d = 700, 900, 4  # deliberately non-multiples of the tile sizes
        samples = rng.uniform(-1, 1, (n, d)).astype(np.float32)
        traj = rng.uniform(-1, 1, (t, d)).astype(np.float32)
        std = np.array([0.05, 0.05, 0.25, 0.25], np.float32)
        mask = (rng.uniform(size=t) > 0.3).astype(np.float32)
        interpret = jax.default_backend() != "tpu"
        fsum, fmax = footprint_and_spread(
            jnp.array(samples), jnp.array(traj), jnp.array(std), jnp.array(mask),
            interpret=interpret,
        )
        want = psi_matrix(jnp.array(samples), jnp.array(traj), jnp.array(std), jnp.array(mask))
        np.testing.assert_allclose(fsum, jnp.sum(want, 1), rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(fmax, jnp.max(want, 1), rtol=1e-3, atol=1e-4)


class TestKldivGrad:
    def test_matches_autodiff(self, rng):
        """grad must equal d/dx [sum_n w_n psi(x, s_n)] by construction."""
        d, n = 3, 40
        x = rng.uniform(-1, 1, 2 * d).astype(np.float32)  # full state, explr = first half
        samples = rng.uniform(-1, 1, (n, d)).astype(np.float32)
        std = np.full(d, 0.2, np.float32)
        w = rng.uniform(0.5, 2.0, n).astype(np.float32)
        explr_idx = jnp.arange(d)

        def scalar_footprint(xf):
            xe = xf[explr_idx]
            sq = jnp.sum(jnp.square(xe[None] - samples) / std, -1)
            return jnp.sum(jnp.exp(-0.5 * sq) * w)

        want = jax.grad(scalar_footprint)(jnp.array(x))
        got = kldiv_grad(jnp.array(x), jnp.array(samples), explr_idx, jnp.array(std), jnp.array(w))
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_zero_outside_explr(self, rng):
        x = rng.uniform(-1, 1, 4).astype(np.float32)
        samples = rng.uniform(-1, 1, (5, 2)).astype(np.float32)
        got = np.asarray(
            kldiv_grad(jnp.array(x), jnp.array(samples), jnp.array([0, 1]),
                       jnp.full(2, 0.1), jnp.ones(5))
        )
        assert got[2] == 0 and got[3] == 0


class TestNormalizers:
    def test_renormalize_max_is_one(self, rng):
        d = rng.uniform(0.1, 5.0, 100).astype(np.float32)
        out = np.asarray(renormalize(jnp.array(d)))
        np.testing.assert_allclose(out.max(), 1.0, rtol=1e-6)
        assert (out > 0).all()

    def test_renormalize_clamp_floor(self):
        d = jnp.array([1.0, 1e-12, 1.0])
        out = np.asarray(renormalize(d))
        # tiny entries clamp to min_val before log, so ratio is min_val/max-prob
        assert out[1] > 0

    def test_cost_norm(self):
        d = jnp.array([1.0, np.nan, 3.0])
        out = np.asarray(cost_norm(d))
        np.testing.assert_allclose(out.sum(), 1.0, rtol=1e-6)
        assert not np.isnan(out).any()


@pytest.mark.slow
class TestPallasAdam:
    """Fused Adam (ops/pallas_adam.py) must reproduce optax.adam exactly —
    both the inline jnp path (used for small leaves / CPU) and the Pallas
    kernel (interpret mode off-TPU)."""

    def _setup(self, rng):
        import optax
        params = {
            "w": jnp.array(rng.normal(size=(640, 128)).astype(np.float32)),
            "b": jnp.array(rng.normal(size=(7,)).astype(np.float32)),
        }
        grads_seq = [
            {
                "w": jnp.array(rng.normal(size=(640, 128)).astype(np.float32)),
                "b": jnp.array(rng.normal(size=(7,)).astype(np.float32)),
            }
            for _ in range(4)
        ]
        return optax, params, grads_seq

    def test_inline_path_matches_optax(self, rng):
        from ealv_tpu.ops.pallas_adam import adam_init, adam_apply
        optax, params, grads_seq = self._setup(rng)
        opt = optax.adam(3e-3)
        po, oo = params, opt.init(params)
        pp, sp = params, adam_init(params)
        for g in grads_seq:
            up, oo = opt.update(g, oo)
            po = optax.apply_updates(po, up)
            pp, sp = adam_apply(pp, sp, g, 3e-3, force_kernel=False)
        for a, b in zip(jax.tree.leaves(po), jax.tree.leaves(pp)):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_kernel_matches_optax(self, rng):
        from ealv_tpu.ops.pallas_adam import adam_update_flat
        import optax
        n = 640 * 128  # % 128 == 0, non-multiple of the block row count
        p = jnp.array(rng.normal(size=n).astype(np.float32))
        m = jnp.zeros(n)
        v = jnp.zeros(n)
        g = jnp.array(rng.normal(size=n).astype(np.float32))
        interpret = jax.default_backend() != "tpu"
        p2, m2, v2 = adam_update_flat(
            p, m, v, g, jnp.float32(1e-3), jnp.int32(1), interpret=interpret
        )
        opt = optax.adam(1e-3)
        oo = opt.init(p)
        up, oo = opt.update(g, oo)
        want = optax.apply_updates(p, up)
        np.testing.assert_allclose(p2, want, rtol=1e-6, atol=1e-7)

    def test_optax_wrapper(self, rng):
        from ealv_tpu.ops.pallas_adam import pallas_adam
        optax, params, grads_seq = self._setup(rng)
        ref = optax.adam(1e-3)
        ours = pallas_adam(1e-3)
        po, oo = params, ref.init(params)
        pp, op = params, ours.init(params)
        for g in grads_seq[:2]:
            up, oo = ref.update(g, oo)
            po = optax.apply_updates(po, up)
            up2, op = ours.update(g, op, pp)
            pp = optax.apply_updates(pp, up2)
        for a, b in zip(jax.tree.leaves(po), jax.tree.leaves(pp)):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


@pytest.mark.slow
class TestFastConv:
    """Custom-VJP VALID conv (ops/fast_conv.py): forward identical to
    lax.conv_general_dilated; dx/dW match jax autodiff of the plain conv
    (the dW path runs in space-to-depth layout for lane-friendly shapes;
    the im2col variant is the retained negative result)."""

    # shapes exercise s2d pad (H not divisible by s), the k2 slice edge
    # (k=s: padded s2d rows exceed the k2 window), and k>s
    @pytest.mark.parametrize("variant", ["s2d", "im2col", "pallas"])
    @pytest.mark.parametrize("shape", [(2, 17, 17, 3, 5, 3, 2),
                                       (1, 20, 20, 4, 6, 5, 3),
                                       (2, 16, 16, 2, 3, 3, 3),
                                       (1, 13, 11, 1, 2, 1, 1)])
    def test_fwd_and_grads_match_autodiff(self, rng, shape, variant):
        from jax import lax
        from ealv_tpu.ops.fast_conv import CONV_VARIANTS
        conv2d_valid = CONV_VARIANTS[variant]
        B, H, W, Cin, Cout, k, s = shape
        x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(k, k, Cin, Cout)).astype(np.float32))
        ref = lambda x, w: lax.conv_general_dilated(
            x, w, (s, s), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        cot = jnp.asarray(rng.normal(size=ref(x, w).shape).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(conv2d_valid(x, w, s)),
                                      np.asarray(ref(x, w)))
        gx0, gw0 = jax.grad(lambda x, w: (ref(x, w) * cot).sum(), (0, 1))(x, w)
        gx1, gw1 = jax.grad(
            lambda x, w: (conv2d_valid(x, w, s) * cot).sum(), (0, 1))(x, w)
        np.testing.assert_allclose(gx1, gx0, atol=1e-5)
        np.testing.assert_allclose(gw1, gw0, rtol=1e-5, atol=1e-4)

    def test_model_grads_match_plain_encoder(self, rng):
        from ealv_tpu.models import CVAE, cvae_loss
        kw = dict(img_dim=(24, 24, 3), z_dim=8, s_dim=2, hidden_dim=(32, 16),
                  cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(4, 6))
        m_fast = CVAE(fast_encoder_grads=True, **kw)
        m_ref = CVAE(fast_encoder_grads=False, **kw)
        key = jax.random.PRNGKey(0)
        p = m_ref.init({"params": key}, jnp.zeros((1, 2)),
                       jnp.zeros((1, 24, 24, 3)), train=False)
        x = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
        y = jnp.asarray(rng.uniform(size=(4, 24, 24, 3)).astype(np.float32))

        def loss(model, p):
            out = model.apply(p, x, y, train=False)
            return cvae_loss(out, y, beta=0.01, gamma=0.1, gamma_weight=0.1,
                             learn_force=False, other_locs=False)[0]

        l0, g0 = jax.value_and_grad(lambda p: loss(m_ref, p))(p)
        l1, g1 = jax.value_and_grad(lambda p: loss(m_fast, p))(p)
        assert abs(float(l0 - l1)) < 1e-5
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(b, a, atol=1e-6)

    def test_model_grads_match_pallas_variant(self, rng):
        # the direct Pallas wgrad wired through the whole model must give
        # the same gradients as XLA's native encoder (interpret mode on CPU)
        from ealv_tpu.models import CVAE, cvae_loss
        kw = dict(img_dim=(24, 24, 3), z_dim=8, s_dim=2, hidden_dim=(32, 16),
                  cnn_kernels=(3, 3), cnn_strides=(2, 2), cnn_channels=(4, 6))
        m_fast = CVAE(fast_encoder_grads="pallas", **kw)
        m_ref = CVAE(fast_encoder_grads=False, **kw)
        key = jax.random.PRNGKey(0)
        p = m_ref.init({"params": key}, jnp.zeros((1, 2)),
                       jnp.zeros((1, 24, 24, 3)), train=False)
        x = jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32))
        y = jnp.asarray(rng.uniform(size=(4, 24, 24, 3)).astype(np.float32))

        def loss(model, p):
            out = model.apply(p, x, y, train=False)
            return cvae_loss(out, y, beta=0.01, gamma=0.1, gamma_weight=0.1,
                             learn_force=False, other_locs=False)[0]

        l0, g0 = jax.value_and_grad(lambda p: loss(m_ref, p))(p)
        l1, g1 = jax.value_and_grad(lambda p: loss(m_fast, p))(p)
        assert abs(float(l0 - l1)) < 1e-5
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(b, a, atol=1e-6)

    def test_pallas_wgrad_production_shapes(self, rng):
        # the production encoder geometries the kernel targets: conv0
        # (cin=3, k=3, s=2, 180->89 — odd H phase padding) and conv1
        from jax import lax
        from ealv_tpu.ops.pallas_wgrad import conv_wgrad_direct
        for B, H, W, Cin, Cout, k, s in [(2, 180, 180, 3, 10, 3, 2),
                                         (2, 89, 89, 10, 10, 3, 2)]:
            x = jnp.asarray(rng.normal(size=(B, H, W, Cin)).astype(np.float32))
            w = jnp.asarray(rng.normal(size=(k, k, Cin, Cout)).astype(np.float32))
            ref = lambda x, w: lax.conv_general_dilated(
                x, w, (s, s), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            cot = jnp.asarray(rng.normal(size=ref(x, w).shape).astype(np.float32))
            gw0 = jax.grad(lambda w: (ref(x, w) * cot).sum())(w)
            gw1 = conv_wgrad_direct(x, cot, k=k, stride=s)
            np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw0),
                                       rtol=1e-4, atol=1e-3)
