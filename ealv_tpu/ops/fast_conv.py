"""VALID strided conv with a hand-written VJP tuned for tiny channel counts.

Motivation (xprof, ARCHITECTURE.md §7): the encoder's convs have 3-20
channels; XLA lowers their weight-gradient as a conv over the full-res
input whose measured bandwidth is 160-270 GB/s (vs the ~850 GB/s the same
tensors reach elsewhere) — ~0.3 ms of the 1.85 ms SGD step. The root cause
is lane geometry: with cin=3 the 128-wide vector lanes run 2% full.

The weight-gradient here is computed in **space-to-depth layout**: a
(k, k, cin, cout) gradient of a stride-s conv equals a gathered subset of
the (k', k', s*s*cin, cout) gradient of the stride-1 conv over
space_to_depth(x, s), where k' = ceil(k/s). The s2d form packs s*s*cin
channels onto the lanes (e.g. 12 instead of 3) and contracts with stride 1:

  dW = gather(wgrad_{s=1}(s2d(x), cot))  (XLA's own wgrad lowering via
                                          linear_transpose of the s2d conv)
  dx = conv_transpose(cot, W)            (XLA's own transposed conv)

**MEASURED RESULT: a LOSS in context — keep ``fast_encoder_grads=False``.**
An isolated 100-iteration-scan A/B showed the s2d wgrad 1.14-1.24x faster
at the encoder shapes, but that bench held x loop-invariant, so XLA
HOISTED the s2d transform out of the scan and it was measured for free.
In the real trainer x is a fresh activation every step: the inline tick
goes 51.2 -> 62.2 ms/call (custom-vjp packaging itself is free: the same
VJP with XLA's plain wgrad measures 51.5). Methodology lesson recorded in
ARCHITECTURE §4: when microbenching a transform of an operand, make that
operand loop-CARRIED or the scan hoists the transform.

Forward is exactly ``lax.conv_general_dilated`` — same math, same params;
only the backward schedule changes. dx is dead-code-eliminated by XLA for
the first layer (image input carries no gradient). Equivalence (fwd + both
grads) is tested against jax's autodiff of the plain conv in
tests/test_kernels.py::TestFastConv.

The earlier im2col attempt (patches materialized in HBM + one MXU matmul)
is kept as ``conv2d_valid_im2col`` — also a measured LOSS (ARCHITECTURE
§4); the patch matrix costs k*k/cin times the input's HBM bytes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


def _space_to_depth(x, s: int, h_tgt: int, w_tgt: int):
    """(B, H, W, C) -> (B, h_tgt, w_tgt, s*s*C), slicing/zero-padding the
    spatial dims to exactly h_tgt*s x w_tgt*s first (rows beyond the last
    VALID window never enter the gradient; padded rows multiply a zero
    cotangent slot)."""
    b, h, w, c = x.shape
    hs, ws = h_tgt * s, w_tgt * s
    if hs <= h:
        x = x[:, :hs]
    else:
        x = jnp.pad(x, ((0, 0), (0, hs - h), (0, 0), (0, 0)))
    if ws <= w:
        x = x[:, :, :ws]
    else:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, ws - w), (0, 0)))
    x = x.reshape(b, h_tgt, s, w_tgt, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h_tgt, w_tgt, s * s * c)


def _dw_s2d(x, cot, k: int, stride: int):
    """Weight gradient of a VALID stride-`stride` conv, computed in s2d
    layout. x (B,H,W,Cin), cot (B,oh,ow,Cout) -> (k,k,Cin,Cout) f32."""
    s = stride
    cin = x.shape[3]
    cout = cot.shape[3]
    _, oh, ow, _ = cot.shape
    k2 = -(-k // s)
    x2 = _space_to_depth(x, s, oh + k2 - 1, ow + k2 - 1)

    # dw2[a, b, ch, co] = sum_{n,p,q} x2[n, p+a, q+b, ch] * cot[n,p,q,co].
    # Let XLA emit its OWN weight-gradient lowering (batch-group-count
    # conv) for the stride-1 s2d conv via linear_transpose — a hand-rolled
    # batch-contracting dimension-numbers conv measures ~20% slower in
    # context (it forces real data transposes)
    w2_spec = jax.ShapeDtypeStruct((k2, k2, s * s * cin, cout), x2.dtype)
    (dw2,) = jax.linear_transpose(
        lambda w2: lax.conv_general_dilated(
            x2, w2, window_strides=(1, 1), padding="VALID",
            dimension_numbers=_DN,
        ),
        w2_spec,
    )(cot)  # (k2, k2, s*s*cin, cout)

    # gather the original taps: (kh, kw) lives at spatial (kh//s, kw//s),
    # channel ((kh%s)*s + kw%s)*cin + ci
    kh = np.arange(k)
    a = np.repeat(kh // s, k).reshape(k, k)
    b = np.tile(kh // s, k).reshape(k, k)
    ph = np.repeat(kh % s, k).reshape(k, k)
    pw = np.tile(kh % s, k).reshape(k, k)
    ch = ((ph * s + pw) * cin)[:, :, None] + np.arange(cin)[None, None, :]
    return dw2[a[:, :, None], b[:, :, None], ch, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_valid(x, w, stride: int):
    """y = VALID conv, NHWC x (B,H,W,Cin), HWIO w (k,k,Cin,Cout)."""
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=_DN,
    )


def _fwd(x, w, stride: int):
    return conv2d_valid(x, w, stride), (x, w)


def _dx_conv_transpose(cot, w, x_shape, stride: int):
    """dx via XLA's transposed conv; the floor-divided tail rows of x never
    entered the forward window, so their gradient is zero-padded."""
    dx = lax.conv_transpose(
        cot, w, strides=(stride, stride), padding="VALID",
        transpose_kernel=True, dimension_numbers=_DN,
    )
    pad_h = x_shape[1] - dx.shape[1]
    pad_w = x_shape[2] - dx.shape[2]
    if pad_h or pad_w:
        dx = jnp.pad(dx, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return dx


def _bwd(stride: int, res, cot):
    x, w = res
    dw = _dw_s2d(x, cot, w.shape[0], stride).astype(w.dtype)
    dx = _dx_conv_transpose(cot, w, x.shape, stride).astype(x.dtype)
    return dx, dw


conv2d_valid.defvjp(_fwd, _bwd)


# ---------------------------------------------------------------------------
# im2col variant — kept as the recorded negative result (ARCHITECTURE §4)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_valid_im2col(x, w, stride: int):
    """Same forward; backward computes dW = patches(x)^T @ cot with the
    patch matrix materialized in HBM. Measured LOSS vs XLA's native wgrad
    at the encoder shapes (the patches cost k*k/cin x the input bytes)."""
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=_DN,
    )


def _fwd_im2col(x, w, stride: int):
    return conv2d_valid_im2col(x, w, stride), (x, w)


def _bwd_im2col(stride: int, res, cot):
    x, w = res
    k = w.shape[0]
    cin = x.shape[3]
    cout = cot.shape[3]

    patches = lax.conv_general_dilated_patches(
        x, (k, k), (stride, stride), "VALID", dimension_numbers=_DN,
    )  # (B, oh, ow, Cin*k*k), feature order C-major: (Cin, k, k)
    pm = patches.reshape(-1, cin * k * k)
    cm = cot.reshape(-1, cout)
    dw = lax.dot_general(
        pm, cm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Cin*k*k, Cout)
    dw = dw.reshape(cin, k, k, cout).transpose(1, 2, 0, 3).astype(w.dtype)
    dx = _dx_conv_transpose(cot, w, x.shape, stride).astype(x.dtype)
    return dx, dw


conv2d_valid_im2col.defvjp(_fwd_im2col, _bwd_im2col)


# ---------------------------------------------------------------------------
# Pallas direct-wgrad variant (VERDICT r3 item 3): in-VMEM patch building
# from phase planes — x and the cotangent each read from HBM exactly once,
# no materialized transform. See ops/pallas_wgrad.py for the kernel and the
# roofline analysis; tests/test_kernels.py::TestPallasWgrad for exactness.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_valid_pallas(x, w, stride: int):
    """Same forward; backward computes dW with the direct Pallas kernel."""
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=_DN,
    )


def _fwd_pallas(x, w, stride: int):
    return conv2d_valid_pallas(x, w, stride), (x, w)


def _bwd_pallas(stride: int, res, cot):
    from .pallas_wgrad import conv_wgrad_direct

    x, w = res
    dw = conv_wgrad_direct(x, cot, k=w.shape[0], stride=stride).astype(w.dtype)
    dx = _dx_conv_transpose(cot, w, x.shape, stride).astype(x.dtype)
    return dx, dw


conv2d_valid_pallas.defvjp(_fwd_pallas, _bwd_pallas)

CONV_VARIANTS = {
    True: conv2d_valid,  # bool back-compat: the s2d form
    "s2d": conv2d_valid,
    "im2col": conv2d_valid_im2col,
    "pallas": conv2d_valid_pallas,
}
