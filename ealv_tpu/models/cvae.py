"""Conditional VAE ("sensor-object model"), flax/TPU-native.

Capability parity targets (structure + behavior, re-designed for TPU):
  - RGB model:  franka_test/scripts/vae/vae.py (VAE :11, forward :155,
    reparameterize :146, decode_samples_only :184, init_uniform_grid :215,
    update_dist :223, pdf_torch :244).
  - Force variant: vae/vae_force.py (encoder input feat+force+pose :167,
    split_y_out :156-164, 11-tuple forward :186-197), selected by
    ``learn_force`` (vae/__init__.py:3-8).
  - Conv shape math: vae/vae_utils.py get_input_dim :19 / get_padding :32.
  - z-ensemble: vae/vae_buffer.py zBufferTorch :87 + build_z_buffer
    (vae.py:134-138).

TPU-first design decisions:
  - NHWC image layout (TPU conv native), images as (H, W, C).
  - The reference's torch.jit.fork "chunk decoder" (vae.py:277-286) — CPU
    thread fan-out for the 2000-sample entropy decode — disappears: the
    batched decode IS one MXU matmul chain, optionally in bfloat16.
  - The mutable seed/z "distribution state" (registered buffers in torch)
    becomes an explicit ``ModelState`` pytree threaded through jitted
    programs, so update_dist/pdf compose with lax.scan and shard_map.
  - ``pdf`` is branchless: the pre-first-sample uniform prior
    (init_uniform_grid) is selected with jnp.where on an ``initialized``
    flag instead of Python control flow.
"""

from __future__ import annotations

from typing import Sequence, Tuple, NamedTuple

import jax
import jax.numpy as jnp
from flax import linen as nn

LOGVAR_LIMS = (-10.0, 2.0)  # parity: vae.py:104


def conv_output_dims(hw, kernels, strides):
    """Spatial dims after a VALID conv stack (parity: get_input_dim :19-30).

    Returns (final_hw, per_layer_dims) where per_layer_dims[0] is the input.
    """
    dims = [tuple(hw)]
    for k, s in zip(kernels, strides):
        h, w = dims[-1]
        dims.append(((h - k) // s + 1, (w - k) // s + 1))
    return dims[-1], dims


class _FastValidConv(nn.Module):
    """nn.Conv(padding=VALID) drop-in (same 'kernel'/'bias' param tree, same
    lecun-normal init) computing through a custom-VJP conv from
    ops.fast_conv whose weight-gradient schedule is selected by
    ``variant``: 's2d' (space-to-depth re-layout), 'im2col' (MXU patch
    matmul), or 'pallas' (direct in-VMEM patch kernel)."""

    features: int
    kernel: int
    stride: int
    dtype: jnp.dtype = jnp.float32
    variant: object = "s2d"

    @nn.compact
    def __call__(self, x):
        from ..ops.fast_conv import CONV_VARIANTS

        conv = CONV_VARIANTS[self.variant]
        k = self.kernel
        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, x.shape[-1], self.features), jnp.float32,
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,),
                       jnp.float32)
        y = conv(x.astype(self.dtype), w.astype(self.dtype), self.stride)
        return y + b.astype(self.dtype)


def _ceil_to(c: int, m: int) -> int:
    return c + (-c) % m


class _LanePadConv(nn.Module):
    """nn.Conv(padding=VALID) drop-in (same 'kernel'/'bias' param tree, same
    lecun-normal init) computing on LANE-PADDED operands: input channels and
    weight planes are zero-padded to a multiple of ``lane`` at trace time,
    and the padded output channels (exact zeros — zero weight columns, zero
    bias) are carried through, so the conv contracts/broadcasts at lane-
    friendly widths while the parameters, checkpoints, and math stay those
    of the 3/10/10/20-channel reference model (test_config.yaml:70-80).
    The hypothesis under test (VERDICT r4 #3): XLA's conv kernels on the
    128-lane VPU/MXU waste most of each vector register at cin=3..20, and
    explicit padding may buy a faster lowering than the padding the
    hardware does implicitly. Measured in context by scripts/ab_lanepad.py."""

    features: int
    in_features: int
    kernel: int
    stride: int
    lane: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, cin, cout = self.kernel, self.in_features, self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, cin, cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
        x = x.astype(self.dtype)
        cin_p = _ceil_to(x.shape[-1], self.lane)  # input may arrive padded
        cout_p = _ceil_to(cout, self.lane)
        if x.shape[-1] < cin_p:
            x = jnp.pad(x, ((0, 0),) * (x.ndim - 1)
                        + ((0, cin_p - x.shape[-1]),))
        w_p = jnp.pad(w.astype(self.dtype),
                      ((0, 0), (0, 0), (0, cin_p - cin), (0, cout_p - cout)))
        b_p = jnp.pad(b.astype(self.dtype), (0, cout_p - cout))
        dn = jax.lax.conv_dimension_numbers(x.shape, w_p.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(
            x, w_p, (self.stride, self.stride), "VALID",
            dimension_numbers=dn)
        return y + b_p


class _LanePadConvTranspose(nn.Module):
    """nn.ConvTranspose drop-in (same 'kernel'/'bias' param tree and
    padding-spec semantics) on lane-padded operands — see _LanePadConv."""

    features: int
    in_features: int
    kernel: int
    strides: Tuple[int, int]
    padding: tuple
    lane: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k, cin, cout = self.kernel, self.in_features, self.features
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, cin, cout), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (cout,), jnp.float32)
        x = x.astype(self.dtype)
        cin_p = _ceil_to(x.shape[-1], self.lane)
        cout_p = _ceil_to(cout, self.lane)
        if x.shape[-1] < cin_p:
            x = jnp.pad(x, ((0, 0),) * (x.ndim - 1)
                        + ((0, cin_p - x.shape[-1]),))
        w_p = jnp.pad(w.astype(self.dtype),
                      ((0, 0), (0, 0), (0, cin_p - cin), (0, cout_p - cout)))
        b_p = jnp.pad(b.astype(self.dtype), (0, cout_p - cout))
        y = jax.lax.conv_transpose(
            x, w_p, self.strides, self.padding,
            rhs_dilation=(1, 1), transpose_kernel=False)
        return y + b_p


class ModelState(NamedTuple):
    """Target-distribution runtime state (the torch registered buffers
    seed_x/seed_y/z_samples/init of vae.py:95-101, plus the optional
    z-ensemble ring of zBufferTorch)."""

    seed_x: jax.Array  # (s_dim,)
    seed_y: jax.Array  # (H, W, C)
    seed_force: jax.Array  # (1,)
    z: jax.Array  # (z_dim,)
    z_buff: jax.Array  # (z_mem, z_dim) ensemble ring
    initialized: jax.Array  # () bool


class CVAE(nn.Module):
    """Conditional VAE: image (+ optional force) conditioned on pose.

    encoder: conv(img) -> flatten -> MLP([feat, (force,) pose]) -> (mu, logvar)
    decoder: MLP([z, pose]) -> [y_logvar, (force_pred,) img_feat]
             -> conv_transpose(img_feat) -> image prediction
    """

    img_dim: Tuple[int, int, int]  # (H, W, C)
    z_dim: int = 16
    s_dim: int = 2
    hidden_dim: Sequence[int] = (512, 256)
    cnn_kernels: Sequence[int] = (3, 3, 5)
    cnn_strides: Sequence[int] = (2, 2, 3)
    cnn_channels: Sequence[int] = (10, 10, 20)
    y_logvar_dim: int = 1
    learn_force: bool = False
    dx: bool = False  # decode relative pose (samples - seed_x)
    z_mem: int = 5  # z-ensemble size (build_z_buffer z_mem=5)
    compute_dtype: jnp.dtype = jnp.float32
    # encoder convs via ops/fast_conv.py: identical forward + params, but
    # the weight-gradient schedule is replaced. False = XLA's native
    # lowering (default). True/'s2d' = space-to-depth re-layout and
    # 'im2col' = materialized patch matmul — both measured LOSSES at
    # production sizes (ARCHITECTURE §4), kept as recorded negatives.
    # 'pallas' = the direct in-VMEM patch kernel (ops/pallas_wgrad.py).
    fast_encoder_grads: object = False
    # image decoder family: 'conv_transpose' mirrors the reference's
    # ConvTranspose2d stack; 'resize_conv' = nearest-upsample + stride-1
    # conv — same capacity per layer, avoids XLA's slow transposed-conv
    # gradients on TPU (also the standard checkerboard-artifact fix)
    decoder_mode: str = "conv_transpose"
    # lane-packed conv layouts (VERDICT r4 #3): compute every conv /
    # transposed conv on channel dims zero-padded to a multiple of this
    # (8/16/32...), parameters and math unchanged. 0 = native shapes.
    # Measured in context by scripts/ab_lanepad.py; see ARCHITECTURE §4.
    lane_pad: int = 0

    def setup(self):
        (h, w), self._dims = conv_output_dims(
            self.img_dim[:2], self.cnn_kernels, self.cnn_strides
        )
        self.inner_shape = (h, w, self.cnn_channels[-1])
        self.feat_dim = h * w * self.cnn_channels[-1]
        self.force_dim = 1 if self.learn_force else 0

        conv_cls = _FastValidConv if self.fast_encoder_grads else None
        enc_cin = [self.img_dim[2]] + list(self.cnn_channels[:-1])
        self.enc_convs = [
            (conv_cls(features=c, kernel=k, stride=s, dtype=self.compute_dtype,
                      variant=self.fast_encoder_grads, name=f"enc_conv{i}")
             if conv_cls else
             _LanePadConv(features=c, in_features=enc_cin[i], kernel=k,
                          stride=s, lane=self.lane_pad,
                          dtype=self.compute_dtype, name=f"enc_conv{i}")
             if self.lane_pad else
             nn.Conv(c, (k, k), strides=(s, s), padding="VALID",
                     dtype=self.compute_dtype, name=f"enc_conv{i}"))
            for i, (k, s, c) in enumerate(
                zip(self.cnn_kernels, self.cnn_strides, self.cnn_channels)
            )
        ]
        self.enc_mlp = [
            nn.Dense(d, dtype=self.compute_dtype, name=f"enc_fc{i}")
            for i, d in enumerate(self.hidden_dim)
        ]
        self.enc_out = nn.Dense(2 * self.z_dim, dtype=self.compute_dtype, name="enc_out")

        self.dec_mlp = [
            nn.Dense(d, dtype=self.compute_dtype, name=f"dec_fc{i}")
            for i, d in enumerate(reversed(self.hidden_dim))
        ]
        self.dec_out = nn.Dense(
            self.feat_dim + self.y_logvar_dim + self.force_dim,
            dtype=self.compute_dtype,
            name="dec_out",
        )
        in_channels = [self.img_dim[2]] + list(self.cnn_channels[:-1])
        if self.decoder_mode == "conv_transpose":
            # fold the shape-deficit fix into the transposed conv's padding:
            # a VALID transpose of a floor-divided forward conv comes up
            # `deficit` pixels short per dim; padding (k-1, k-1+deficit)
            # zero-extends the hi edge inside the conv — torch's
            # output_padding semantics (vae_utils.get_padding :32-49) with
            # no separate pad op (the explicit edge-pad + its gradient cost
            # ~0.17 ms/SGD step at production sizes)
            L = len(self.cnn_kernels)
            convs = []
            for i, (k, s, c_out) in enumerate(
                zip(
                    reversed(self.cnn_kernels),
                    reversed(self.cnn_strides),
                    reversed(in_channels),
                )
            ):
                in_hw = self._dims[L - i]
                target = self._dims[L - 1 - i]
                pads = tuple(
                    (k - 1, k - 1 + (target[d] - ((in_hw[d] - 1) * s + k)))
                    for d in range(2)
                )
                if self.lane_pad:
                    convs.append(
                        _LanePadConvTranspose(
                            features=c_out,
                            in_features=(list(reversed(self.cnn_channels))
                                         + [self.img_dim[2]])[i],
                            kernel=k, strides=(s, s), padding=pads,
                            lane=self.lane_pad, dtype=self.compute_dtype,
                            name=f"dec_conv{i}")
                    )
                    continue
                convs.append(
                    nn.ConvTranspose(c_out, (k, k), strides=(s, s),
                                     padding=pads, dtype=self.compute_dtype,
                                     name=f"dec_conv{i}")
                )
            self.dec_convs = convs
        elif self.decoder_mode == "subpixel":
            from .subpixel import SubpixelConvTranspose

            self.dec_convs = [
                SubpixelConvTranspose(c_out, (k, k), strides=(s, s),
                                      dtype=self.compute_dtype,
                                      name=f"dec_conv{i}")
                for i, (k, s, c_out) in enumerate(
                    zip(
                        reversed(self.cnn_kernels),
                        reversed(self.cnn_strides),
                        reversed(in_channels),
                    )
                )
            ]
        elif self.decoder_mode == "resize_conv":
            self.dec_convs = [
                nn.Conv(c_out, (k, k), strides=(1, 1), padding="SAME",
                        dtype=self.compute_dtype, name=f"dec_conv{i}")
                for i, (k, c_out) in enumerate(
                    zip(reversed(self.cnn_kernels), reversed(in_channels))
                )
            ]
        else:
            raise ValueError(f"unknown decoder_mode {self.decoder_mode!r}")

    # ---------- sub-networks ----------

    def img_encode(self, y):
        """(B, H, W, C) -> (B, feat). Final conv unactivated, like the
        reference's Flatten-replaces-last-ReLU (vae.py:48)."""
        h = y.astype(self.compute_dtype)
        for i, conv in enumerate(self.enc_convs):
            h = conv(h)
            if i < len(self.enc_convs) - 1:
                h = nn.relu(h)
        if self.lane_pad:
            # padded channels are exact zeros carried through the stack;
            # drop them before the flatten so feat_dim stays the model's
            h = h[..., : self.inner_shape[2]]
        return h.reshape(h.shape[0], -1)

    def img_decode(self, feat):
        """(B, feat) -> (B, H, W, C). The VALID conv-transpose shape deficit
        is folded into each layer's padding spec (output_padding semantics,
        vae_utils.get_padding :32-49); subpixel keeps an explicit edge-pad."""
        h = feat.reshape(feat.shape[0], *self.inner_shape)
        fwd_dims = self._dims
        for i, conv in enumerate(self.dec_convs):
            target = fwd_dims[len(self.dec_convs) - 1 - i]
            if self.decoder_mode == "resize_conv":
                h = jax.image.resize(
                    h, (h.shape[0], target[0], target[1], h.shape[3]), "nearest"
                )
                h = conv(h)
            else:  # conv_transpose (exact via padding) / subpixel (pads)
                h = conv(h)
                pad_h = target[0] - h.shape[1]
                pad_w = target[1] - h.shape[2]
                if pad_h or pad_w:
                    h = jnp.pad(h, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                                mode="edge")
            if i < len(self.dec_convs) - 1:
                h = nn.relu(h)
        if self.lane_pad and h.shape[-1] != self.img_dim[2]:
            h = h[..., : self.img_dim[2]]
        return h

    def encode_fn(self, x, y, force=None):
        feat = self.img_encode(y)
        parts = [feat]
        if self.learn_force:
            parts.append(force.astype(self.compute_dtype))
        parts.append(x.astype(self.compute_dtype))
        h = jnp.concatenate(parts, axis=1)
        for fc in self.enc_mlp:
            h = nn.relu(fc(h))
        out = self.enc_out(h).astype(jnp.float32)
        z_mu, z_logvar = out[:, : self.z_dim], out[:, self.z_dim :]
        return z_mu, jnp.clip(z_logvar, *LOGVAR_LIMS)

    def decode_fn(self, z, x):
        """(B, z), (B, s) -> (img_feat, y_logvar, force_pred).

        Output head layout matches split_y_out (vae_force.py:156-164):
        [y_logvar | force_pred | img_feat], with force sharing the image
        logvar ("combo var"). ``feat`` stays in the compute dtype (it feeds
        the conv decoder, which computes in it anyway); only the small
        logvar/force heads are upcast — the training-path image tensors are
        the SGD step's dominant HBM traffic, so no f32 copies of them are
        ever materialized."""
        h = jnp.concatenate([z, x], axis=1).astype(self.compute_dtype)
        for fc in self.dec_mlp:
            h = nn.relu(fc(h))
        out = self.dec_out(h)
        v = self.y_logvar_dim
        y_logvar = jnp.clip(out[:, :v].astype(jnp.float32), *LOGVAR_LIMS)
        if self.learn_force:
            force_pred = out[:, v : v + 1].astype(jnp.float32)
            feat = out[:, v + 1 :]
        else:
            force_pred = jnp.zeros((out.shape[0], 1), jnp.float32)
            feat = out[:, v:]
        return feat, y_logvar, force_pred

    # ---------- public API ----------

    def __call__(self, x, y, force=None, x_decode=None, train: bool = False):
        """Full forward pass (parity: vae.py:155-182 / vae_force.py:166-197).

        Returns a dict with img_pred, img_logvar, z_mu, z_logvar, z,
        force_pred, force_logvar, and (if x_decode given) the cross-decode
        outputs at the second pose.
        """
        z_mu, z_logvar = self.encode_fn(x, y, force)
        if train:
            eps = jax.random.normal(self.make_rng("reparam"), z_mu.shape, z_mu.dtype)
            z = z_mu + eps * jnp.exp(0.5 * z_logvar)
        else:
            z = z_mu

        x_dec = jnp.zeros_like(x) if self.dx else x
        if x_decode is not None:
            # fuse the gamma-loss cross-decode (other_locs) into ONE batched
            # decoder + conv-decoder pass of 2B rows instead of two serial
            # passes — same math, better MXU/VPU utilization
            b = x.shape[0]
            feat_all, y_logvar_all, force_all = self.decode_fn(
                jnp.concatenate([z, z], 0), jnp.concatenate([x_dec, x_decode], 0)
            )
            # image predictions stay in the compute dtype (bf16 by default):
            # the loss upcasts elementwise inside its fused reduce, so no f32
            # copy of the (2B, H, W, C) tensor ever hits HBM
            img_all = self.img_decode(feat_all)
            out = dict(
                img_pred=img_all[:b],
                img_logvar=y_logvar_all[:b],
                z_mu=z_mu,
                z_logvar=z_logvar,
                z=z,
                force_pred=force_all[:b],
                force_logvar=y_logvar_all[:b],  # combo var, vae_force.py:159-161
                img_pred_decode=img_all[b:],
                img_logvar_decode=y_logvar_all[b:],
                force_pred_decode=force_all[b:],
                force_logvar_decode=y_logvar_all[b:],
            )
            return out
        feat, y_logvar, force_pred = self.decode_fn(z, x_dec)
        img_pred = self.img_decode(feat)
        return dict(
            img_pred=img_pred,
            img_logvar=y_logvar,  # (B, y_logvar_dim); broadcast in the loss
            z_mu=z_mu,
            z_logvar=z_logvar,
            z=z,
            force_pred=force_pred,
            force_logvar=y_logvar,  # combo var, vae_force.py:159-161
        )

    def decode_samples(self, state: ModelState, samples, use_z_ensemble: bool = False):
        """Batched decode of candidate poses with the current z seed(s) —
        the reference's chunk-decoded hot path (decode_samples_only :184,
        pdf_torch :244) as one fused batch.

        Returns (y_logvar (N, y_logvar_dim), img_feat) averaged over the
        z ensemble when enabled.
        """
        x = samples
        if self.dx:
            x = x - state.seed_x[None, :]
        n = x.shape[0]
        if use_z_ensemble:
            zs = state.z_buff  # (z_mem, z_dim)
            xs = jnp.broadcast_to(x[None], (self.z_mem, n, x.shape[1]))
            feat, y_logvar, _ = self.decode_fn(
                zs[:, None, :].repeat(n, 1).reshape(-1, self.z_dim),
                xs.reshape(-1, x.shape[1]),
            )
            y_logvar = y_logvar.reshape(self.z_mem, n, -1).mean(0)
            feat = feat.reshape(self.z_mem, n, -1).mean(0)
        else:
            z = jnp.broadcast_to(state.z[None, :], (n, self.z_dim))
            feat, y_logvar, _ = self.decode_fn(z, x)
        return y_logvar, feat

    def pdf(self, state: ModelState, samples, use_z_ensemble: bool = False):
        """Predictive-uncertainty target distribution (parity: pdf_torch
        :244-275): exp(y_logvar) max over channels at each candidate pose;
        uniform (init_uniform_grid :215-221) before the first sample."""
        y_logvar, _ = self.decode_samples(state, samples, use_z_ensemble)
        var = jnp.exp(jnp.clip(y_logvar, *LOGVAR_LIMS))
        var = jnp.max(var, axis=1)
        uniform = jnp.ones(samples.shape[0], jnp.float32)
        return jnp.where(state.initialized, var, uniform)


def init_model_state(model: CVAE) -> ModelState:
    h, w, c = model.img_dim
    return ModelState(
        seed_x=jnp.zeros(model.s_dim, jnp.float32),
        seed_y=jnp.zeros((h, w, c), jnp.float32),
        seed_force=jnp.zeros(1, jnp.float32),
        z=jnp.zeros(model.z_dim, jnp.float32),
        z_buff=jnp.zeros((model.z_mem, model.z_dim), jnp.float32),
        initialized=jnp.zeros((), bool),
    )


def update_dist(model: CVAE, params, state: ModelState, x, y, force=None):
    """Re-seed the target distribution from the latest sample (parity:
    update_dist :223-236). x (s_dim,), y (H, W, C). Returns (state, out)."""
    force_b = None
    if model.learn_force:
        force_b = (force if force is not None else jnp.zeros(1))[None, :]
    out = model.apply(params, x[None], y[None], force=force_b, train=False)
    z = out["z"][0]
    return (
        state._replace(
            seed_x=x,
            seed_y=y.astype(jnp.float32),  # bf16-ring images re-widened so
            # ModelState keeps a stable pytree dtype across jit boundaries
            seed_force=force if force is not None else state.seed_force,
            z=z,
            z_buff=jnp.concatenate([z[None], state.z_buff[:-1]], 0),
            initialized=jnp.ones((), bool),
        ),
        out,
    )
