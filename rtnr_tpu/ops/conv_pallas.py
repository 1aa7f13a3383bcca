"""Pallas TPU direct 3x3 conv for the U-Net's full-resolution layers.

Why: XLA's conv emitter caps the 64-channel full-resolution convs at an
N=64 output tile (half the MXU's 128 lanes) and surrounds them with layout
copies — measured ~31% MXU / ~2.5 ms per conv at 1088x1920x64 on v5e
(scripts/profile_unet_layers.py, PROFILE_r02.md). This kernel reshapes the
SAME contraction so both MXU dims are full, using a PLANAR layout:

  activation ((H+2)*C, Wp) bf16 — row-block y holds image row y-1 with
  channels on SUBLANES and x on LANES (blocks 0 and H+1 are zero padding,
  Wp = W rounded up to a lane tile). This satisfies every Mosaic DMA
  constraint (minor dim is a multiple of 128; sub-128 minor dims cannot be
  memref_sliced at all) and makes the conv a single full-MXU matmul:

  - P[(dy,c), (t,x)] = x[g*TR+t+dy-1, c, x]: for each of the step's TR
    image rows, rows [t*C, t*C+3C) of the fetched block are ALREADY the
    three dy taps stacked — P is a lane-concat of TR contiguous slices,
    no im2col materialization in HBM;
  - W2[(dx,f), (dy,c)] = k[dy, dx, c, f]: one matmul A = W2 @ P of shape
    (3F, 3C) x (3C, TR*Wp) does all 9*C*F MACs per pixel (K = 3C = 192,
    N = TR*Wp huge — both MXU dims full, FLOP-identical to the conv);
  - y[f, (t,x)] = A[F+f, (t,x)] + A[f, (t,x-1)] + A[2F+f, (t,x+1)], two
    static lane rolls with first/last-column masks (the roll across the
    t-boundary lands exactly on the masked columns).

The folded-BN bias add + ReLU fuse into the epilogue, and the kernel
accepts two inputs (the decoder's skip + upsample pair) by stacking both
on K — the virtual-concat trick of models.unet.ConvSplitInput without the
concat. Outputs stay planar so conv chains (DoubleConv) pay the
NHWC<->planar conversion once per pair. Forward/inference only (training
uses the XLA conv path).

Semantics source: reference model/model.py:5-19 (DoubleConv 3x3 s1 p1).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def to_planar(x: jax.Array, wp: Optional[int] = None) -> jax.Array:
    """(N=1, H, W, C) -> planar ((H+2)*C, Wp) bf16 with zero pad blocks."""
    n, h, w, c = x.shape
    assert n == 1
    wp = wp or _round_up(w, 128)
    xt = jnp.transpose(x[0].astype(jnp.bfloat16), (0, 2, 1))  # (H, C, W)
    if wp != w:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, wp - w)))
    xt = xt.reshape(h * c, wp)
    z = jnp.zeros((c, wp), jnp.bfloat16)
    return jnp.concatenate([z, xt, z], axis=0)


def from_planar(y: jax.Array, h: int, w: int, c: int) -> jax.Array:
    """planar ((H+2)*C, Wp) -> (1, H, W, C)."""
    wp = y.shape[1]
    core = y[c : (h + 1) * c].reshape(h, c, wp)[:, :, :w]
    return jnp.transpose(core, (0, 2, 1))[None]


def _conv_kernel(
    *refs,
    n_in: int,
    C: Tuple[int, ...],
    F: int,
    W: int,
    Wp: int,
    TR: int,
    relu: bool,
    has_bias: bool,
):
    xs_hbm = refs[:n_in]
    w_hbm = refs[n_in]
    b_hbm = refs[n_in + 1] if has_bias else None
    out_hbm = refs[n_in + 1 + int(has_bias)]
    scratch = refs[n_in + 2 + int(has_bias):]
    xs_v = scratch[:n_in]
    w_v = scratch[n_in]
    b_v = scratch[n_in + 1] if has_bias else None
    y_v = scratch[n_in + 2 + int(has_bias) - 1]
    z_v = scratch[n_in + 3 + int(has_bias) - 1]
    in_sem = scratch[n_in + 4 + int(has_bias) - 1]
    out_sem = scratch[n_in + 5 + int(has_bias) - 1]

    g = pl.program_id(0)
    steps = pl.num_programs(0)
    even = jax.lax.rem(g, 2) == 0

    def start_fetch(gn, s):
        for i in range(n_in):
            pltpu.make_async_copy(
                xs_hbm[i].at[pl.ds(gn * TR * C[i], (TR + 2) * C[i]), :],
                xs_v[i].at[s],
                in_sem.at[s, i],
            ).start()

    def wait_fetch(s):
        for i in range(n_in):
            pltpu.make_async_copy(
                xs_hbm[i].at[pl.ds(0, (TR + 2) * C[i]), :],
                xs_v[i].at[s],
                in_sem.at[s, i],
            ).wait()

    @pl.when(g == 0)
    def _():
        start_fetch(0, 0)
        cp = pltpu.make_async_copy(w_hbm, w_v, out_sem)
        cp.start()
        cp.wait()
        if has_bias:
            cp = pltpu.make_async_copy(b_hbm, b_v, out_sem)
            cp.start()
            cp.wait()
        z_v[:, :] = jnp.zeros((F, Wp), jnp.bfloat16)

    @pl.when((g + 1 < steps) & even)
    def _():
        start_fetch(g + 1, 1)

    @pl.when((g + 1 < steps) & jnp.logical_not(even))
    def _():
        start_fetch(g + 1, 0)

    @pl.when(even)
    def _():
        wait_fetch(0)

    @pl.when(jnp.logical_not(even))
    def _():
        wait_fetch(1)

    slot = jax.lax.rem(g, 2)
    M = TR * Wp

    # P: per image row t, rows [t*C, t*C+3C) are the dy taps stacked; the
    # two-input form stacks both inputs on K (virtual concat)
    pieces = []
    for i in range(n_in):
        xi = xs_v[i][slot]
        pieces.append(
            jnp.concatenate(
                [xi[t * C[i] : (t + 3) * C[i], :] for t in range(TR)], axis=1
            )
        )  # (3*Ci, TR*Wp)
    P = pieces[0] if n_in == 1 else jnp.concatenate(pieces, axis=0)

    A = jax.lax.dot_general(
        w_v[:, :],
        P,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (3F, TR*Wp) f32

    lane = jax.lax.broadcasted_iota(jnp.int32, (F, M), 1)
    x_in_row = jax.lax.rem(lane, Wp)
    y = A[F : 2 * F, :]
    y = y + jnp.where(x_in_row != 0, pltpu.roll(A[0:F, :], 1, axis=1),
                      jnp.float32(0.0))
    y = y + jnp.where(x_in_row != W - 1, pltpu.roll(A[2 * F :, :], M - 1, axis=1),
                      jnp.float32(0.0))

    if has_bias:
        y = y + b_v[:, 0:1].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, jnp.float32(0.0))
    if Wp != W:
        # keep lane padding zero (bias/ReLU would leak into a chained
        # conv's x+1 tap at the true right edge otherwise)
        y = jnp.where(x_in_row < W, y, jnp.float32(0.0))
    y_v[:, :] = y.astype(jnp.bfloat16)

    # output rows [(1 + g*TR + t)*F, +F) per image row t (planar, padded)
    for t in range(TR):
        dma = pltpu.make_async_copy(
            y_v.at[:, pl.ds(t * Wp, Wp)],
            out_hbm.at[pl.ds((1 + g * TR + t) * F, F), :],
            out_sem,
        )
        dma.start()
        dma.wait()

    @pl.when(g == 0)
    def _():
        dma = pltpu.make_async_copy(z_v, out_hbm.at[pl.ds(0, F), :], out_sem)
        dma.start()
        dma.wait()

    @pl.when(g == steps - 1)
    def _():
        dma = pltpu.make_async_copy(
            z_v, out_hbm.at[pl.ds((g * TR + TR + 1) * F, F), :], out_sem
        )
        dma.start()
        dma.wait()


@functools.partial(
    jax.jit, static_argnames=("h", "w", "relu", "rows_per_step", "interpret")
)
def conv3x3_planar(
    xs: Sequence[jax.Array],
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    h: int,
    w: Optional[int] = None,
    relu: bool = False,
    rows_per_step: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """3x3 stride-1 same-padding conv over the channel-concat of planar
    inputs, returning a planar output.

    xs: one or two planar ((H+2)*Ci, Wp) bf16 arrays (see ``to_planar``);
    kernel (3, 3, sumC, F) with channels ordered as the xs concat; bias
    (F,) or None; fused ReLU optional. Returns planar ((H+2)*F, Wp) bf16.
    H must be a multiple of ``rows_per_step``.
    """
    xs = tuple(xs)
    n_in = len(xs)
    assert n_in in (1, 2)
    Wp = xs[0].shape[1]
    w = w or Wp
    Cs = tuple(int(x.shape[0]) // (h + 2) for x in xs)
    for x, c in zip(xs, Cs):
        assert x.shape[0] == (h + 2) * c and c % 8 == 0, (x.shape, h, c)
    sumC = sum(Cs)
    F = kernel.shape[-1]
    assert kernel.shape[:3] == (3, 3, sumC)
    TR = rows_per_step
    assert h % TR == 0
    steps = h // TR

    # W2[(dx, f), (input i, dy, c)] = kernel[dy, dx, c_global, f]
    kparts = []
    off = 0
    for c in Cs:
        kp = kernel[:, :, off : off + c, :]  # (3, 3, c, F)
        off += c
        kparts.append(kp.transpose(1, 3, 0, 2).reshape(3 * F, 3 * c))
    w2 = jnp.concatenate(kparts, axis=1).astype(jnp.bfloat16)  # (3F, 3*sumC)

    has_bias = bias is not None
    args = list(xs) + [w2]
    if has_bias:
        args.append(
            jnp.broadcast_to(bias.astype(jnp.bfloat16)[:, None], (F, 128))
        )

    scratch = [pltpu.VMEM((2, (TR + 2) * c, Wp), jnp.bfloat16) for c in Cs]
    scratch += [pltpu.VMEM((3 * F, 3 * sumC), jnp.bfloat16)]
    if has_bias:
        scratch += [pltpu.VMEM((F, 128), jnp.bfloat16)]
    scratch += [
        pltpu.VMEM((F, TR * Wp), jnp.bfloat16),  # y
        pltpu.VMEM((F, Wp), jnp.bfloat16),  # zero pad block
        pltpu.SemaphoreType.DMA((2, n_in)),
        pltpu.SemaphoreType.DMA(()),
    ]

    out = pl.pallas_call(
        functools.partial(
            _conv_kernel,
            n_in=n_in,
            C=Cs,
            F=F,
            W=w,
            Wp=Wp,
            TR=TR,
            relu=relu,
            has_bias=has_bias,
        ),
        out_shape=jax.ShapeDtypeStruct(((h + 2) * F, Wp), jnp.bfloat16),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
    return out


def conv3x3_pallas(
    xs: Sequence[jax.Array],
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    relu: bool = False,
    rows_per_step: int = 4,
    interpret: bool = False,
) -> jax.Array:
    """NHWC wrapper: 3x3 s1 same conv over the channel-concat of ``xs``
    ((1, H, W, Ci) each), returning (1, H, W, F) bf16. Converts to/from the
    planar layout; chains of convs should use ``conv3x3_planar`` directly
    to amortize the conversion."""
    n, h, w, _ = xs[0].shape
    outs = []
    for b in range(n):  # planar kernel is per-image; render batch is small
        xps = [to_planar(x[b : b + 1]) for x in xs]
        yp = conv3x3_planar(
            xps, kernel, bias, h=h, w=w, relu=relu,
            rows_per_step=rows_per_step, interpret=interpret,
        )
        outs.append(from_planar(yp, h, w, kernel.shape[-1]))
    return outs[0] if n == 1 else jnp.concatenate(outs, axis=0)
