"""Import a reference torch checkpoint into the TPU-native CVAE.

Migration seam for reference users: a ``model*.pth`` trained by the torch
stack (saved as a raw ``state_dict`` by sensor_main_module.py:301-304 /
trainer_module.py:667, or wrapped by the periodic checkpoint dict at
trainer_module.py:581 and the hot-handoff tmp dict at :627) converts to a
flax parameter pytree + ``ModelState`` for this framework's ``CVAE``, so
fingerprint extraction / identification / evaluation can resume on TPU from
a CPU-trained reference run without retraining.

Layout bridges (reference architecture: vae/vae.py:11-101,
vae/vae_force.py:11-101):

  - Conv2d weight (O, I, kH, kW)           -> flax Conv kernel (kH, kW, I, O)
  - ConvTranspose2d weight (I, O, kH, kW)  -> flax ConvTranspose kernel
    (kH, kW, I, O) with BOTH spatial axes flipped (torch's transposed conv
    is the gradient of a cross-correlation; flax's default
    ``transpose_kernel=False`` form is a fractionally-strided
    cross-correlation — verified exact vs torch incl. output_padding, which
    our decoder folds into each layer's hi-edge padding spec)
  - Linear weight (out, in)                -> flax Dense kernel (in, out)
  - NCHW<->NHWC flatten order: torch flattens conv features as (C, h, w)
    (vae.py:48 Flatten after the conv stack), ours as (h, w, C) — the image
    -feature columns of the first encoder Dense and the image-feature ROWS
    of the decoder output head are permuted accordingly
  - registered buffers seed_x/seed_y/z_samples (vae.py:98-100) ->
    ``ModelState`` (seed_y NCHW -> NHWC)

No torch import here: ``state_dict`` values may be torch CPU tensors
(``np.asarray`` handles them) or plain arrays, so the library stays
torch-free; only the CLI (scripts/import_torch_checkpoint.py) loads .pth.
"""

from __future__ import annotations

import re

import numpy as np
import jax.numpy as jnp

from ..models.cvae import CVAE, ModelState, init_model_state, conv_output_dims

__all__ = ["convert_state_dict", "unwrap_checkpoint"]


def unwrap_checkpoint(obj):
    """Peel the reference's checkpoint containers down to the state_dict.

    Accepts a raw state_dict (model*.pth), the periodic checkpoint dict
    {'state_dict': ..., 'optimizer': ...} (trainer_module.py:581), or the
    hot-handoff dict {'model': ..., 'learning_ind': ...} (:627). DDP
    'module.'-prefixed keys are stripped (trainer wraps the model in DDP).
    """
    if isinstance(obj, dict):
        if "state_dict" in obj and isinstance(obj["state_dict"], dict):
            obj = obj["state_dict"]
        elif "model" in obj and isinstance(obj["model"], dict):
            obj = obj["model"]
    return {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in obj.items()
    }


def _np(v):
    a = np.asarray(v, dtype=np.float32)
    return a


def _seq_indices(sd, prefix):
    """Sorted Sequential indices of layers with a weight under ``prefix``
    (the reference interleaves ReLUs, and load_config's auto-extra-FC
    layers make the count config-dependent — discover from the keys)."""
    pat = re.compile(re.escape(prefix) + r"\.(\d+)\.weight$")
    return sorted(int(m.group(1)) for k in sd if (m := pat.match(k)))


def _feat_perm(inner_hw, channels):
    """perm[flax_flat_idx] = torch_flat_idx for the conv-feature vector:
    flax position (i, j, c) reads torch position c*h*w + i*w + j."""
    h, w = inner_hw
    return np.arange(channels * h * w).reshape(channels, h, w) \
        .transpose(1, 2, 0).ravel()


def convert_state_dict(state_dict, model: CVAE):
    """Reference torch ``state_dict`` -> (flax variables, ModelState).

    ``model`` must be constructed with the checkpoint's architecture
    (img_dim NHWC, z/s dims, hidden_dim, cnn_*, learn_force) — every
    converted array is shape-checked against it, so a config mismatch
    fails loudly rather than loading garbage.
    """
    sd = unwrap_checkpoint(state_dict)
    (h, w), _ = conv_output_dims(model.img_dim[:2], model.cnn_kernels,
                                 model.cnn_strides)
    c_last = model.cnn_channels[-1]
    feat = h * w * c_last
    perm = _feat_perm((h, w), c_last)
    force_dim = 1 if model.learn_force else 0
    v = model.y_logvar_dim

    params = {}

    # ---- encoder convs: img_encoder.{2i}.weight (O, I, k, k) ----
    conv_idx = _seq_indices(sd, "img_encoder")
    if len(conv_idx) != len(model.cnn_kernels):
        raise ValueError(
            f"checkpoint has {len(conv_idx)} encoder convs, model expects "
            f"{len(model.cnn_kernels)}")
    for i, li in enumerate(conv_idx):
        W = _np(sd[f"img_encoder.{li}.weight"])
        params[f"enc_conv{i}"] = {
            "kernel": jnp.asarray(np.ascontiguousarray(
                W.transpose(2, 3, 1, 0))),
            "bias": jnp.asarray(_np(sd[f"img_encoder.{li}.bias"])),
        }

    # ---- encoder MLP: encode.{2i}.weight (out, in) ----
    # input ordering is [feat, (force,) pose] in both stacks
    # (vae.py:157 / vae_force.py:169 vs CVAE.encode_fn)
    enc_idx = _seq_indices(sd, "encode")
    n_hidden = len(enc_idx) - 1
    if n_hidden != len(model.hidden_dim):
        raise ValueError(
            f"checkpoint has {n_hidden} encoder hidden layers, model "
            f"expects {len(model.hidden_dim)}")
    col_perm = np.concatenate(
        [perm, feat + np.arange(force_dim + model.s_dim)])
    for i, li in enumerate(enc_idx):
        W = _np(sd[f"encode.{li}.weight"])
        if i == 0:
            if W.shape[1] != feat + force_dim + model.s_dim:
                raise ValueError(
                    f"encoder input dim {W.shape[1]} != model "
                    f"{feat + force_dim + model.s_dim}")
            W = W[:, col_perm]
        name = f"enc_fc{i}" if i < n_hidden else "enc_out"
        params[name] = {
            "kernel": jnp.asarray(np.ascontiguousarray(W.T)),
            "bias": jnp.asarray(_np(sd[f"encode.{li}.bias"])),
        }

    # ---- decoder MLP: decode.{2i}.weight; output head rows permuted ----
    # head layout is [y_logvar | force_pred | img_feat] in both stacks
    # (split_y_out vae_force.py:156-164 / vae.py:168 vs CVAE.decode_fn)
    dec_idx = _seq_indices(sd, "decode")
    if len(dec_idx) - 1 != len(model.hidden_dim):
        raise ValueError(
            f"checkpoint has {len(dec_idx) - 1} decoder hidden layers, "
            f"model expects {len(model.hidden_dim)}")
    row_perm = np.concatenate(
        [np.arange(v + force_dim), v + force_dim + perm])
    for i, li in enumerate(dec_idx):
        W = _np(sd[f"decode.{li}.weight"])
        b = _np(sd[f"decode.{li}.bias"])
        if i == len(dec_idx) - 1:
            if W.shape[0] != v + force_dim + feat:
                raise ValueError(
                    f"decoder output dim {W.shape[0]} != model "
                    f"{v + force_dim + feat}")
            W, b = W[row_perm], b[row_perm]
            name = "dec_out"
        else:
            name = f"dec_fc{i}"
        params[name] = {
            "kernel": jnp.asarray(np.ascontiguousarray(W.T)),
            "bias": jnp.asarray(b),
        }

    # ---- decoder convs: img_decoder.{2i+1}.weight (I, O, k, k) ----
    tconv_idx = _seq_indices(sd, "img_decoder")
    if len(tconv_idx) != len(model.cnn_kernels):
        raise ValueError(
            f"checkpoint has {len(tconv_idx)} decoder convs, model expects "
            f"{len(model.cnn_kernels)}")
    for i, li in enumerate(tconv_idx):
        W = _np(sd[f"img_decoder.{li}.weight"])
        params[f"dec_conv{i}"] = {
            "kernel": jnp.asarray(np.ascontiguousarray(
                W.transpose(2, 3, 0, 1)[::-1, ::-1])),
            "bias": jnp.asarray(_np(sd[f"img_decoder.{li}.bias"])),
        }

    variables = {"params": params}

    # shape-check against the model's own init tree: any residual config
    # mismatch (kernel size, stride-driven feat dim, z_dim) fails here
    import jax

    ref_shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, model.s_dim)), jnp.zeros((1,) + tuple(model.img_dim)),
            force=jnp.zeros((1, 1)) if model.learn_force else None,
            train=False,
        )
    )
    flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_shapes)[0])
    flat_new = dict(jax.tree_util.tree_flatten_with_path(variables)[0])
    if set(flat_ref) != set(flat_new):
        missing = set(flat_ref) ^ set(flat_new)
        raise ValueError(f"param tree mismatch: {missing}")
    for k, refv in flat_ref.items():
        if tuple(flat_new[k].shape) != tuple(refv.shape):
            raise ValueError(
                f"shape mismatch at {jax.tree_util.keystr(k)}: checkpoint "
                f"{tuple(flat_new[k].shape)} vs model {tuple(refv.shape)}")

    # ---- registered buffers -> ModelState (vae.py:98-101) ----
    mstate = init_model_state(model)
    if "seed_x" in sd:
        seed_x = _np(sd["seed_x"]).reshape(-1)[: model.s_dim]
        # reference buffer is (1, C, H, W) (vae.py:96); img_dim here is
        # (H, W, C), so the CHW target is (C, H, W) — NOT reversed(img_dim),
        # which would scramble non-square frames as (C, W, H)
        seed_y = _np(sd["seed_y"]).reshape(
            (model.img_dim[2], model.img_dim[0], model.img_dim[1]))
        seed_y = seed_y.transpose(1, 2, 0)  # CHW -> HWC
        z = _np(sd["z_samples"]).reshape(-1)[: model.z_dim]
        initialized = bool(np.any(seed_y) or np.any(z) or np.any(seed_x))
        mstate = mstate._replace(
            seed_x=jnp.asarray(seed_x),
            seed_y=jnp.asarray(seed_y),
            z=jnp.asarray(z),
            z_buff=jnp.tile(jnp.asarray(z)[None], (model.z_mem, 1)),
            initialized=jnp.asarray(initialized),
        )
        if model.learn_force and "seed_force" in sd:
            mstate = mstate._replace(
                seed_force=jnp.asarray(_np(sd["seed_force"]).reshape(-1)[:1]))
    return variables, mstate
