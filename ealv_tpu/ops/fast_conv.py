"""VALID strided conv with a hand-written VJP tuned for tiny channel counts.

Motivation (xprof, ARCHITECTURE.md §7): the encoder's first convs have 3-10
channels; XLA lowers their weight-gradient as a conv over the full-res
input whose measured bandwidth is 159-269 GB/s (vs the ~850 GB/s the same
tensors reach elsewhere) — ~0.25 ms of the 2.1 ms SGD step. This VJP
computes

  dW = patches(x)^T @ cotangent        (one im2col + one MXU matmul)
  dx = conv_transpose(cotangent, W)    (XLA's own transposed conv)
  db = sum(cotangent)

with the patches materialized once in bf16. Forward is exactly
``lax.conv_general_dilated`` — same math, same params; only the backward
schedule changes. Equivalence (fwd + both grads) is tested against jax's
autodiff of the plain conv in tests/test_kernels.py::TestFastConv.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv2d_valid(x, w, stride: int):
    """y = VALID conv, NHWC x (B,H,W,Cin), HWIO w (k,k,Cin,Cout)."""
    return lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="VALID",
        dimension_numbers=_DN,
    )


def _fwd(x, w, stride: int):
    return conv2d_valid(x, w, stride), (x, w)


def _bwd(stride: int, res, cot):
    x, w = res
    k = w.shape[0]
    B, H, W, Cin = x.shape
    _, oh, ow, Cout = cot.shape

    # dW: im2col patches -> one (k*k*Cin, Cout) MXU matmul
    patches = lax.conv_general_dilated_patches(
        x, (k, k), (stride, stride), "VALID", dimension_numbers=_DN,
    )  # (B, oh, ow, Cin*k*k), feature order C-major: (Cin, k, k)
    pm = patches.reshape(-1, Cin * k * k)
    cm = cot.reshape(-1, Cout)
    dw = lax.dot_general(
        pm, cm, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Cin*k*k, Cout)
    dw = dw.reshape(Cin, k, k, Cout).transpose(1, 2, 0, 3).astype(w.dtype)

    # dx: transposed conv of the cotangent; the floor-divided tail rows of x
    # never entered the forward window, so their gradient is zero-padded
    dx = lax.conv_transpose(
        cot, w, strides=(stride, stride), padding="VALID",
        transpose_kernel=True, dimension_numbers=_DN,
    )
    pad_h = H - dx.shape[1]
    pad_w = W - dx.shape[2]
    if pad_h or pad_w:
        dx = jnp.pad(dx, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    return dx.astype(x.dtype), dw


conv2d_valid.defvjp(_fwd, _bwd)
