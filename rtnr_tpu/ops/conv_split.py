"""Split-planar (polyphase) Pallas kernels for the U-Net's full-resolution
segment: 3x3 conv (+fused bias/ReLU/2x2-pool/1x1-head), 2x2-stride-2
transposed conv, and the layout converters.

Motivation (measured on v5e, PROFILE_r02.md): XLA runs the full-resolution
64-channel convs at ~31% MXU and surrounds the whole full-res segment with
~10 ms of layout copies; a single-planar Pallas conv beats the conv itself
2x but NHWC<->planar conversion costs ~3 ms per 267 MB transpose
(scripts/profile_conv_pallas.py, /tmp probe), eating the win. The fix is to
keep the ENTIRE full-res segment in a layout Pallas can both read and
write, with conversions only at tiny-channel boundaries:

  **split-planar**: a full-res activation is a pair (E, O) of planar
  arrays, E holding even image columns and O odd ones. Each is
  ((H+2)*C, WE) bf16 — row-block y = image row y-1 (blocks 0, H+1 zero),
  channels on sublanes, half-width column index u on lanes, WE = W/2
  rounded up to 128 (lanes >= W/2 zero). Why it wins:

  - every Mosaic DMA constraint holds (minor dim multiple of 128 — NHWC
    arrays with C=64 minor cannot be DMA-sliced at all);
  - the 3x3 conv is TWO full-MXU matmuls (K = 3*sumC, N = TR*WE) plus
    static lane rolls: with AE/AO = W2 @ PE/PO (P = dy-stacked rows,
    W2[(dx,f),(dy,c)] = k[dy,dx,c,f]),
      yE[u] (x=2u)  = AO0[u-1] + AE1[u] + AO2[u]
      yO[u] (x=2u+1)= AE0[u]   + AO1[u] + AE2[u+1]
    — FLOP-identical to the conv, no interleave ops anywhere;
  - 2x2 max-pool is PURE ELEMENTWISE: out[y',u] = max(E,O at rows
    2y',2y'+1)[u] — the column deinterleave is free by construction
    (Mosaic lowers neither strided lane slices nor lane-pair bitcasts);
  - the 2x2-stride-2 ConvTranspose needs NO interleave: its dx=0/1 output
    taps ARE the E/O halves (out[2y+dy, 2u+dx] = W[dy,dx] @ in[y,u]);
  - the final 1x1 conv fuses into the last conv's epilogue (a left-matmul
    over the channel sublanes), so the 64-channel decoder output is never
    written to HBM at all.

Forward/inference only (training uses the XLA conv path). Semantics
source: reference model/model.py:5-19 (DoubleConv), :36-42 (Up),
:45 (final 1x1).
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


def _pad_channels(x: jax.Array, c_to: int) -> jax.Array:
    c = x.shape[-1]
    if c == c_to:
        return x
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, c_to - c),))


def to_split(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(1, H, W, C) -> split-planar (E, O), each ((H+2)*C8, WE) bf16.

    C pads up to a multiple of 8 (sublane tile); W must be even."""
    n, h, w, c = x.shape
    assert n == 1 and w % 2 == 0
    c8 = _round_up(c, 8)
    x = _pad_channels(x.astype(jnp.bfloat16), c8)
    we = _round_up(w // 2, 128)

    def planar(xh):
        xt = jnp.transpose(xh[0], (0, 2, 1))  # (H, C8, W/2)
        if we != w // 2:
            xt = jnp.pad(xt, ((0, 0), (0, 0), (0, we - w // 2)))
        xt = xt.reshape(h * c8, we)
        z = jnp.zeros((c8, we), jnp.bfloat16)
        return jnp.concatenate([z, xt, z], axis=0)

    return planar(x[:, :, 0::2, :]), planar(x[:, :, 1::2, :])


def from_split(e: jax.Array, o: jax.Array, h: int, w: int, c: int) -> jax.Array:
    """split-planar (E, O) -> (1, H, W, C) (drops channel padding)."""
    we = e.shape[1]
    c8 = e.shape[0] // (h + 2)

    def unplanar(y):
        core = y[c8 : (h + 1) * c8].reshape(h, c8, we)[:, :c, : w // 2]
        return jnp.transpose(core, (0, 2, 1))  # (H, W/2, C)

    eh, oh = unplanar(e), unplanar(o)
    return jnp.stack([eh, oh], axis=2).reshape(h, w, c)[None]


def to_planar_half(x: jax.Array) -> jax.Array:
    """(1, H, W, C) -> plain planar ((H+2)*C, Wp) bf16 (no column split) —
    the ConvTranspose input layout."""
    n, h, w, c = x.shape
    assert n == 1 and c % 8 == 0
    wp = _round_up(w, 128)
    xt = jnp.transpose(x[0].astype(jnp.bfloat16), (0, 2, 1))
    if wp != w:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, wp - w)))
    xt = xt.reshape(h * c, wp)
    z = jnp.zeros((c, wp), jnp.bfloat16)
    return jnp.concatenate([z, xt, z], axis=0)


def from_planar_half(y: jax.Array, h: int, w: int, c: int) -> jax.Array:
    """plain planar ((H+2)*C, Wp) -> (1, H, W, C)."""
    wp = y.shape[1]
    core = y[c : (h + 1) * c].reshape(h, c, wp)[:, :, :w]
    return jnp.transpose(core, (0, 2, 1))[None]


# ---------------------------------------------------------------------------
# 3x3 conv kernel (split-planar in -> split-planar out), with optional
# fused 2x2 max-pool side output and optional fused 1x1 head.
# ---------------------------------------------------------------------------


def _conv_split_kernel(
    *refs,
    n_in: int,
    C: Tuple[int, ...],
    F: int,
    F2: int,
    WE: int,
    WHALF: int,
    TR: int,
    relu: bool,
    pool: bool,
    head: bool,
):
    nw = 1 + int(head)  # weight operands
    xs = refs[: 2 * n_in]  # (E0, O0[, E1, O1])
    w_hbm = refs[2 * n_in]
    h_hbm = refs[2 * n_in + 1] if head else None
    b_hbm = refs[2 * n_in + nw]  # bias always present (possibly zeros)
    outs = refs[2 * n_in + nw + 1 :]
    oe_hbm, oo_hbm = outs[0], outs[1]
    pool_hbm = outs[2] if pool else None
    scratch = refs[2 * n_in + nw + 1 + 2 + int(pool) :]
    xs_v = scratch[: 2 * n_in]
    w_v = scratch[2 * n_in]
    h_v = scratch[2 * n_in + 1] if head else None
    b_v = scratch[2 * n_in + nw]
    ye_v = scratch[2 * n_in + nw + 1]
    yo_v = scratch[2 * n_in + nw + 2]
    z_v = scratch[2 * n_in + nw + 3]
    in_sem = scratch[2 * n_in + nw + 4]
    out_sem = scratch[2 * n_in + nw + 5]

    g = pl.program_id(0)
    steps = pl.num_programs(0)
    even = jax.lax.rem(g, 2) == 0
    FO = F2 if head else F

    def start_fetch(gn, s):
        for i in range(2 * n_in):
            ci = C[i // 2]
            pltpu.make_async_copy(
                xs[i].at[pl.ds(gn * TR * ci, (TR + 2) * ci), :],
                xs_v[i].at[s],
                in_sem.at[s, i],
            ).start()

    def wait_fetch(s):
        for i in range(2 * n_in):
            ci = C[i // 2]
            pltpu.make_async_copy(
                xs[i].at[pl.ds(0, (TR + 2) * ci), :], xs_v[i].at[s],
                in_sem.at[s, i],
            ).wait()

    @pl.when(g == 0)
    def _():
        start_fetch(0, 0)
        cp = pltpu.make_async_copy(w_hbm, w_v, out_sem)
        cp.start()
        cp.wait()
        if head:
            cp = pltpu.make_async_copy(h_hbm, h_v, out_sem)
            cp.start()
            cp.wait()
        cp = pltpu.make_async_copy(b_hbm, b_v, out_sem)
        cp.start()
        cp.wait()
        z_v[:, :] = jnp.zeros((FO, WE), jnp.bfloat16)

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
    M = TR * WE

    def build_p(par):  # par: 0 -> E arrays, 1 -> O arrays
        pieces = []
        for i in range(n_in):
            xi = xs_v[2 * i + par][slot]
            ci = C[i]
            pieces.append(
                jnp.concatenate(
                    [xi[t * ci : (t + 3) * ci, :] for t in range(TR)], axis=1
                )
            )
        return pieces[0] if n_in == 1 else jnp.concatenate(pieces, axis=0)

    def mm(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    AE = mm(w_v[:, :], build_p(0))  # (3F, M) f32
    AO = mm(w_v[:, :], build_p(1))

    lane = jax.lax.broadcasted_iota(jnp.int32, (F, M), 1)
    u = jax.lax.rem(lane, WE)
    zero = jnp.float32(0.0)

    # yE[u] (x=2u):   AO0[u-1] + AE1[u] + AO2[u]
    ye = AE[F : 2 * F, :] + AO[2 * F :, :]
    ye = ye + jnp.where(u != 0, pltpu.roll(AO[0:F, :], 1, axis=1), zero)
    # yO[u] (x=2u+1): AE0[u] + AO1[u] + AE2[u+1]
    yo = AE[0:F, :] + AO[F : 2 * F, :]
    yo = yo + jnp.where(
        u != WHALF - 1, pltpu.roll(AE[2 * F :, :], M - 1, axis=1), zero
    )

    bias = b_v[0:F, 0:1].astype(jnp.float32)
    ye = ye + bias
    yo = yo + bias
    if relu:
        ye = jnp.maximum(ye, zero)
        yo = jnp.maximum(yo, zero)
    ye = jnp.where(u < WHALF, ye, zero)
    yo = jnp.where(u < WHALF, yo, zero)

    if head:
        # fused 1x1 conv over channels (left-matmul mixes sublanes)
        h2 = h_v[:, :][:, 0:F]
        hb = b_v[F : F + F2, 0:1].astype(jnp.float32)
        lane2 = jax.lax.broadcasted_iota(jnp.int32, (F2, M), 1)
        u2 = jax.lax.rem(lane2, WE)
        ye = mm(h2, ye.astype(jnp.bfloat16)) + hb
        yo = mm(h2, yo.astype(jnp.bfloat16)) + hb
        ye = jnp.where(u2 < WHALF, ye, zero)
        yo = jnp.where(u2 < WHALF, yo, zero)

    ye_b = ye.astype(jnp.bfloat16)
    yo_b = yo.astype(jnp.bfloat16)
    ye_v[:, :] = ye_b
    yo_v[:, :] = yo_b

    for t in range(TR):
        for v, ohbm in ((ye_v, oe_hbm), (yo_v, oo_hbm)):
            dma = pltpu.make_async_copy(
                v.at[:, pl.ds(t * WE, WE)],
                ohbm.at[pl.ds((1 + g * TR + t) * FO, FO), :],
                out_sem,
            )
            dma.start()
            dma.wait()

    if pool:
        pm = jnp.maximum(ye_b, yo_b)  # column pairs (free deinterleave)
        for s in range(TR // 2):
            row = jnp.maximum(
                pm[:, (2 * s) * WE : (2 * s + 1) * WE],
                pm[:, (2 * s + 1) * WE : (2 * s + 2) * WE],
            )
            ye_v[:, pl.ds(s * WE, WE)] = row
        for s in range(TR // 2):
            dma = pltpu.make_async_copy(
                ye_v.at[:, pl.ds(s * WE, WE)],
                pool_hbm.at[pl.ds((1 + g * (TR // 2) + s) * F, F), :],
                out_sem,
            )
            dma.start()
            dma.wait()

    # zero pad blocks (rows 0 and H+1 of each planar output): pool outputs
    # have F-channel blocks, conv outputs FO-channel ones — z_v is sized FO
    # >= F and sliced for the pool case
    @pl.when(g == 0)
    def _():
        for ohbm, fo in ((oe_hbm, FO), (oo_hbm, FO)) + (
            ((pool_hbm, F),) if pool else ()
        ):
            dma = pltpu.make_async_copy(
                z_v.at[pl.ds(0, fo), :], ohbm.at[pl.ds(0, fo), :], out_sem
            )
            dma.start()
            dma.wait()

    @pl.when(g == steps - 1)
    def _():
        for ohbm, fo, blocks in (
            (oe_hbm, FO, steps * TR),
            (oo_hbm, FO, steps * TR),
        ) + (((pool_hbm, F, steps * (TR // 2)),) if pool else ()):
            dma = pltpu.make_async_copy(
                z_v.at[pl.ds(0, fo), :],
                ohbm.at[pl.ds((blocks + 1) * fo, fo), :],
                out_sem,
            )
            dma.start()
            dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "relu", "pool", "rows_per_step", "interpret"),
)
def conv3x3_split(
    xs: Sequence[jax.Array],
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    head_kernel: Optional[jax.Array] = None,
    head_bias: Optional[jax.Array] = None,
    *,
    h: int,
    w: int,
    relu: bool = False,
    pool: bool = False,
    rows_per_step: int = 4,
    interpret: bool = False,
):
    """3x3 s1 same conv over the channel-concat of split-planar inputs.

    xs: flat (E0, O0[, E1, O1]) planar arrays; kernel (3, 3, sumC, F)
    (sumC may exceed the stored channels — extra rows multiply the zero
    channel padding); bias (F,) or None; optional fused 1x1 head
    (head_kernel (F, F2), head_bias (F2,)) applied after ReLU. Returns
    (E, O) of the conv output — or of the head output when head_kernel is
    given — plus a 2x2-max-pooled plain-planar array when ``pool``.
    """
    assert len(xs) in (2, 4)
    n_in = len(xs) // 2
    WE = xs[0].shape[1]
    Cs = tuple(int(xs[2 * i].shape[0]) // (h + 2) for i in range(n_in))
    sumC = sum(Cs)
    F = kernel.shape[-1]
    TR = rows_per_step
    assert h % TR == 0 and (not pool or TR % 2 == 0)
    steps = h // TR
    head = head_kernel is not None
    F2 = _round_up(head_kernel.shape[-1], 8) if head else F

    # kernel channel rows beyond the stored (padded) channels are dropped;
    # stored zero-pad channels get zero weight rows appended
    kc = kernel.shape[2]
    if kc < sumC:
        kernel = jnp.concatenate(
            [kernel, jnp.zeros((3, 3, sumC - kc, F), kernel.dtype)], axis=2
        )
    kparts = []
    off = 0
    for c in Cs:
        kp = kernel[:, :, off : off + c, :]
        off += c
        kparts.append(kp.transpose(1, 3, 0, 2).reshape(3 * F, 3 * c))
    w2 = jnp.concatenate(kparts, axis=1).astype(jnp.bfloat16)  # (3F, 3sumC)

    bvec = jnp.zeros((F,), jnp.float32) if bias is None else bias
    brows = [jnp.broadcast_to(bvec.astype(jnp.bfloat16)[:, None], (F, 128))]
    args = list(xs) + [w2]
    if head:
        f2 = head_kernel.shape[-1]
        hk = head_kernel.astype(jnp.bfloat16).T  # (F2, F)
        if f2 < F2:
            hk = jnp.concatenate([hk, jnp.zeros((F2 - f2, F), jnp.bfloat16)])
        args.append(jnp.pad(hk, ((0, 0), (0, _round_up(F, 128) - F))))
        hb = jnp.zeros((f2,), jnp.float32) if head_bias is None else head_bias
        hb = jnp.concatenate([hb.astype(jnp.float32),
                              jnp.zeros((F2 - f2,), jnp.float32)])
        brows.append(jnp.broadcast_to(hb.astype(jnp.bfloat16)[:, None], (F2, 128)))
    args.append(jnp.concatenate(brows, axis=0))

    FO = F2 if head else F
    out_shapes = [
        jax.ShapeDtypeStruct(((h + 2) * FO, WE), jnp.bfloat16),
        jax.ShapeDtypeStruct(((h + 2) * FO, WE), jnp.bfloat16),
    ]
    if pool:
        out_shapes.append(
            jax.ShapeDtypeStruct(((h // 2 + 2) * F, WE), jnp.bfloat16)
        )

    scratch = [
        pltpu.VMEM((2, (TR + 2) * Cs[i // 2], WE), jnp.bfloat16)
        for i in range(2 * n_in)
    ]
    scratch += [pltpu.VMEM((3 * F, 3 * sumC), jnp.bfloat16)]
    if head:
        scratch += [pltpu.VMEM((F2, _round_up(F, 128)), jnp.bfloat16)]
    scratch += [
        pltpu.VMEM((F + (F2 if head else 0), 128), jnp.bfloat16),  # biases
        pltpu.VMEM((FO, TR * WE), jnp.bfloat16),  # yE
        pltpu.VMEM((FO, TR * WE), jnp.bfloat16),  # yO
        pltpu.VMEM((FO, WE), jnp.bfloat16),  # zero pad block
        pltpu.SemaphoreType.DMA((2, 2 * n_in)),
        pltpu.SemaphoreType.DMA(()),
    ]

    outs = pl.pallas_call(
        functools.partial(
            _conv_split_kernel,
            n_in=n_in,
            C=Cs,
            F=F,
            F2=F2,
            WE=WE,
            WHALF=w // 2,
            TR=TR,
            relu=relu,
            pool=pool,
            head=head,
        ),
        out_shape=out_shapes,
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(args),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
    return tuple(outs)


# ---------------------------------------------------------------------------
# 2x2 stride-2 ConvTranspose: plain-planar half-res in -> split-planar out
# ---------------------------------------------------------------------------


def _convt_split_kernel(
    x_hbm,
    w_hbm,
    b_hbm,
    oe_hbm,
    oo_hbm,
    x_v,
    w_v,
    b_v,
    ye_v,
    yo_v,
    z_v,
    in_sem,
    out_sem,
    *,
    C: int,
    F: int,
    WE: int,
    WHALF: int,
    TR: int,
):
    g = pl.program_id(0)
    steps = pl.num_programs(0)
    even = jax.lax.rem(g, 2) == 0

    def start_fetch(gn, s):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds((1 + gn * TR) * C, TR * C), :], x_v.at[s],
            in_sem.at[s],
        ).start()

    def wait_fetch(s):
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, TR * C), :], x_v.at[s], in_sem.at[s]
        ).wait()

    @pl.when(g == 0)
    def _():
        start_fetch(0, 0)
        cp = pltpu.make_async_copy(w_hbm, w_v, out_sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(b_hbm, b_v, out_sem)
        cp.start()
        cp.wait()
        z_v[:, :] = jnp.zeros((F, WE), jnp.bfloat16)

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
    M = TR * WE
    P = jnp.concatenate(
        [x_v[slot][t * C : (t + 1) * C, :] for t in range(TR)], axis=1
    )  # (C, M)

    # W4[(dy, dx, f), c] = k[dy, dx, c, f] -> one matmul, all four taps
    A = jax.lax.dot_general(
        w_v[:, :], P, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (4F, M)

    lane = jax.lax.broadcasted_iota(jnp.int32, (F, M), 1)
    u = jax.lax.rem(lane, WE)
    bias = b_v[:, 0:1].astype(jnp.float32)
    outs = []
    for dy in range(2):
        for dx in range(2):
            y = A[(2 * dy + dx) * F : (2 * dy + dx + 1) * F, :] + bias
            y = jnp.where(u < WHALF, y, jnp.float32(0.0))
            outs.append(y.astype(jnp.bfloat16))
    # out image row 2t+dy of this step, E half = dx 0, O half = dx 1
    ye_v[:, :] = jnp.concatenate(
        [
            jnp.concatenate([outs[0][:, t * WE : (t + 1) * WE],
                             outs[2][:, t * WE : (t + 1) * WE]], axis=1)
            for t in range(TR)
        ],
        axis=1,
    )
    yo_v[:, :] = jnp.concatenate(
        [
            jnp.concatenate([outs[1][:, t * WE : (t + 1) * WE],
                             outs[3][:, t * WE : (t + 1) * WE]], axis=1)
            for t in range(TR)
        ],
        axis=1,
    )

    for t in range(2 * TR):
        for v, ohbm in ((ye_v, oe_hbm), (yo_v, oo_hbm)):
            dma = pltpu.make_async_copy(
                v.at[:, pl.ds(t * WE, WE)],
                ohbm.at[pl.ds((1 + g * 2 * TR + t) * F, F), :],
                out_sem,
            )
            dma.start()
            dma.wait()

    @pl.when(g == 0)
    def _():
        for ohbm in (oe_hbm, oo_hbm):
            dma = pltpu.make_async_copy(z_v, ohbm.at[pl.ds(0, F), :], out_sem)
            dma.start()
            dma.wait()

    @pl.when(g == steps - 1)
    def _():
        for ohbm in (oe_hbm, oo_hbm):
            dma = pltpu.make_async_copy(
                z_v, ohbm.at[pl.ds((2 * steps * TR + 1) * F, F), :], out_sem
            )
            dma.start()
            dma.wait()


@functools.partial(
    jax.jit, static_argnames=("h", "w", "rows_per_step", "interpret")
)
def convt2x2_split(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    h: int,
    w: int,
    rows_per_step: int = 4,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """2x2-stride-2 transposed conv: plain-planar ((H+2)*C, Wp) in
    (H = h/2, Wp >= w/2 lanes) -> split-planar (E, O) of the (h, w, F)
    output. kernel (2, 2, C, F) (flax ConvTranspose HWIO), bias (F,)."""
    WE = x.shape[1]
    hh = h // 2
    C = x.shape[0] // (hh + 2)
    F = kernel.shape[-1]
    TR = rows_per_step
    assert hh % TR == 0
    steps = hh // TR

    # flax ConvTranspose (lax.conv_transpose, transpose_kernel=False)
    # applies the SPATIALLY FLIPPED kernel; with stride == kernel size the
    # output subpixel (dy, dx) therefore reads kernel[1-dy, 1-dx]
    # (models/unet.py ConvTranspose2x2MatMul:115-118)
    w4 = (
        kernel[::-1, ::-1].transpose(0, 1, 3, 2).reshape(4 * F, C)
        .astype(jnp.bfloat16)
    )
    bvec = jnp.zeros((F,), jnp.float32) if bias is None else bias
    brow = jnp.broadcast_to(bvec.astype(jnp.bfloat16)[:, None], (F, 128))

    outs = pl.pallas_call(
        functools.partial(
            _convt_split_kernel, C=C, F=F, WE=WE, WHALF=w // 2, TR=TR
        ),
        out_shape=[
            jax.ShapeDtypeStruct(((h + 2) * F, WE), jnp.bfloat16),
            jax.ShapeDtypeStruct(((h + 2) * F, WE), jnp.bfloat16),
        ],
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, TR * C, WE), jnp.bfloat16),
            pltpu.VMEM((4 * F, C), jnp.bfloat16),
            pltpu.VMEM((F, 128), jnp.bfloat16),
            pltpu.VMEM((F, 2 * TR * WE), jnp.bfloat16),
            pltpu.VMEM((F, 2 * TR * WE), jnp.bfloat16),
            pltpu.VMEM((F, WE), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(x, w4, brow)
    return outs[0], outs[1]
