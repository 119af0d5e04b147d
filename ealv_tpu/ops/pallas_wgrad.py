"""Direct Pallas weight-gradient kernel for low-channel strided convs.

VERDICT r3 item 3: the encoder's conv gradients run at 160-460 GB/s
(ARCHITECTURE §7) because 3-20 channels occupy a sliver of the 128-wide
lanes; two prior re-schedules (im2col matmul, space-to-depth re-layout)
lost to the HBM traffic their transforms added. This kernel is the third
form the round-3 notes predicted: patches are built IN VMEM from
phase-decomposed planes, so x and the cotangent are each read from HBM
exactly once and no transformed operand is ever materialized.

The layout: a stride-``s`` VALID conv's taps (kh, kw) touch input phase
(kh % s, kw % s) at plane offset (kh // s, kw // s). Decomposing x into
s*s phase planes of shape (H/s, W/s) (one cheap XLA reshape+transpose,
~2x the input bytes — the only traffic beyond the reads themselves) makes
every tap a CONTIGUOUS (OH, OW) window of one plane: no strided lane
access anywhere in the kernel. Per batch image the kernel computes

    dW[kh, kw, ci, co] += sum_{oh, ow} plane[ci, kh%s, kw%s]
                              [kh//s : kh//s+OH, kw//s : kw//s+OW]
                          * cot[co, oh, ow]

as k*k*cin broadcast-multiply-reduces against the (CO, OH, OW) cotangent
block, accumulating in an f32 VMEM scratch across the batch grid.

Roofline honesty (recorded BEFORE measurement): the op moves ~22 MB and
does 137M MACs (first encoder layer at production shapes). At 819 GB/s
the bytes cost 27 us, but the VPU at 8x128/cycle needs ~140 us at 100%
lane occupancy (OW=89 -> 70%), and an MXU mapping pads (27, 10) output
tiles to (128, 128) for ~1.6% utilization (~80 us). XLA's existing
lowering measures ~140 us. All three forms collide within ~2x of each
other on COMPUTE-side shape waste, not HBM scheduling — the conv gap in
ARCHITECTURE §7 is a property of the reference's 3/10/10/20-channel model
family on 128-lane hardware. The measured A/B decides what ships.

MEASURED RESULT (round 4, real v5e, scripts/ab_wgrad.py --all): a LOSS.
Inline tick 195.9 ms/step vs XLA's 51.1 (s2d 61.9, im2col 75.6). The
per-tap broadcast-multiply-reduce loop (27/90/500 taps across the three
encoder layers) serializes VPU work that XLA's lowering pipelines, and
at 3-20 channels there is no lane occupancy to win back. XLA remains
the dispatch default (`fast_encoder_grads=False`); this kernel stays as
the third measured negative closing the §7 conv-gap question: the gap
is the model family's shapes, not a recoverable scheduling defect.
Numerics note: the kernel's f32 accumulation is ~500x CLOSER to the
HIGHEST-precision reference than XLA's default bf16-MXU lowering
(6.2e-6 vs 3.5e-3 max rel err at first-layer production shapes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _phase_planes(x, s: int, hp: int, wp: int):
    """(B, H, W, C) -> (B, C*s*s, hp, wp) phase decomposition (plane index
    ci*s*s + ph*s + pw), zero-padding rows/cols up to s*hp x s*wp (padded
    cells are never read: every kernel slice stays inside the VALID-conv
    footprint)."""
    b, h, w, c = x.shape
    hs, ws = hp * s, wp * s
    x = x[:, :hs, :ws]  # tail rows/cols beyond the last VALID window
    if hs > h or ws > w:
        x = jnp.pad(x, ((0, 0), (0, max(hs - h, 0)), (0, max(ws - w, 0)),
                        (0, 0)))
    x = x.reshape(b, hp, s, wp, s, c)
    x = jnp.transpose(x, (0, 5, 2, 4, 1, 3))  # (B, C, s, s, hp, wp)
    return x.reshape(b, c * s * s, hp, wp)


def _wgrad_kernel(k: int, s: int, cin: int, cout: int, oh: int, ow: int,
                  nb: int):
    def kernel(xp_ref, dy_ref, out_ref, acc_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        dy = dy_ref[0].astype(jnp.float32)  # (CO, OH, OW)
        # Mosaic layout notes (all verified on the real backend): rank-1
        # values fail TPU vector-layout inference (inferElementwise checks
        # arr.size() >= layout_rank), so every reduction is staged to stay
        # 2-D — axis=2 then axis=1 keepdims — and the accumulator is
        # updated ONCE per batch image with a full (CO, K*K*Cin) block
        # instead of per-row ref writes. Columns are emitted in idx order
        # (idx = (kh*k + kw)*cin + ci), matching the loop nest; the wrapper
        # transposes back to (K*K*Cin, CO).
        cols = []
        for kh in range(k):
            for kw in range(k):
                for ci in range(cin):
                    plane = ci * s * s + (kh % s) * s + (kw % s)
                    xs = xp_ref[
                        0, plane,
                        kh // s: kh // s + oh,
                        kw // s: kw // s + ow,
                    ].astype(jnp.float32)  # contiguous (OH, OW) window
                    t = jnp.sum(xs[None, :, :] * dy, axis=2)  # (CO, OH)
                    cols.append(jnp.sum(t, axis=1, keepdims=True))
        acc_ref[...] = acc_ref[...] + jnp.concatenate(cols, axis=1)

        @pl.when(b == nb - 1)
        def _flush():
            out_ref[...] = acc_ref[...]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "stride", "interpret"))
def conv_wgrad_direct(x, cot, k: int, stride: int,
                      interpret: bool | None = None):
    """Weight gradient of a VALID stride-``stride`` conv, computed by the
    direct Pallas kernel. x (B, H, W, Cin), cot (B, OH, OW, Cout) ->
    (k, k, Cin, Cout) float32. Matches jax.grad of lax.conv_general_dilated
    (tests/test_kernels.py::TestPallasWgrad)."""
    s = stride
    b, h, w, cin = x.shape
    _, oh, ow, cout = cot.shape
    hp = (k - 1) // s + oh
    wp = (k - 1) // s + ow

    xp = _phase_planes(x, s, hp, wp)  # (B, Cin*s*s, hp, wp)
    dyp = jnp.transpose(cot, (0, 3, 1, 2))  # (B, CO, OH, OW)

    kernel = _wgrad_kernel(k, s, cin, cout, oh, ow, b)
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, cin * s * s, hp, wp), lambda i: (i, 0, 0, 0)),
            pl.BlockSpec((1, cout, oh, ow), lambda i: (i, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((cout, k * k * cin), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((cout, k * k * cin), jnp.float32),
        scratch_shapes=[pltpu.VMEM((cout, k * k * cin), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # sequential: accumulator
        ),
        interpret=(jax.default_backend() != "tpu"
                   if interpret is None else interpret),
    )(xp, dyp)
    return out.T.reshape(k, k, cin, cout)
