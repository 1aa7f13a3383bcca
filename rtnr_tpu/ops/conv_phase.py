"""P-phase packed polyphase Pallas kernels: the whole U-Net pyramid in one
layout family.

Generalizes the even/odd split-planar design: an (H, W, C) activation at
pyramid level l is stored as ONE array ((H+2)*C, P*WS) bf16 where
P = 2**(levels-l) phases (full resolution P=16 for a 4-level net), lane
slot p (width WS=128) holds the columns x = u*P + p at slot-local index u
(u >= W/P lanes are zero; row-blocks 0 and H+1 are zero padding; channels
on sublanes). Why this layout closes the whole net:

- 2x2 max-pool:   out phase q = max(phase 2q, phase 2q+1) over a row pair
  — static lane slices at every level, never an interleave;
- 2x2/s2 ConvT:   out phase 2p+dx of rows 2y+dy = W[1-dy,1-dx] @ in phase p
  of row y (flax flipped-kernel semantics) — static slot writes;
- 3x3 conv:       ONE full-MXU matmul A = W2 @ P_mat over all phases
  (K = 3*sumC, N = TR*P*WS), then the x+-1 taps are two static lane rolls
  (+-WS for the in-row phase step, wrap rolls for the phase-boundary step)
  selected by a phase mask — FLOP-identical to the conv;
- skips chain decoder<->encoder at the same level with zero conversions;
  NHWC touches only the 5-channel input and 3-channel output.

Every Mosaic constraint holds by construction (all DMA minor dims are
P*WS multiples of 128; slot arithmetic is power-of-two). Forward/inference
only. Semantics source: reference model/model.py:5-19 (DoubleConv),
:36-42 (Up), :45 (final 1x1); measured rationale in PROFILE_r02.md.
"""

from __future__ import annotations

import functools
import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WS = 128  # lanes per phase slot


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def to_phase(x: jax.Array, P: int) -> jax.Array:
    """(1, H, W, C) -> packed phase-planar ((H+2)*C8, P*WS) bf16."""
    n, h, w, c = x.shape
    assert n == 1 and w % P == 0 and w // P <= WS
    c8 = _round_up(c, 8)
    if c8 != c:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, c8 - c)))
    wu = w // P
    xt = jnp.transpose(x[0].astype(jnp.bfloat16), (0, 2, 1))  # (H, C8, W)
    xt = xt.reshape(h, c8, wu, P).transpose(0, 1, 3, 2)  # (H, C8, P, WU)
    xt = jnp.pad(xt, ((0, 0), (0, 0), (0, 0), (0, WS - wu)))
    xt = xt.reshape(h * c8, P * WS)
    z = jnp.zeros((c8, P * WS), jnp.bfloat16)
    return jnp.concatenate([z, xt, z], axis=0)


def from_phase(y: jax.Array, h: int, w: int, c: int, P: int) -> jax.Array:
    """packed phase-planar -> (1, H, W, C) (drops padding)."""
    c8 = y.shape[0] // (h + 2)
    wu = w // P
    core = y[c8 : (h + 1) * c8].reshape(h, c8, P, WS)[:, :c, :, :wu]
    return jnp.transpose(core, (0, 3, 2, 1)).reshape(h, w, c)[None]


def _conv_phase_kernel(
    *refs,
    n_in: int,
    C: Tuple[int, ...],
    F: int,
    F2: int,
    FB: int,
    P: int,
    WU: int,
    TR: int,
    relu: bool,
    pool: bool,
    head: bool,
    up_cd: int = 0,  # fused ConvTranspose: deep input channel count (0 = off)
    up_h: int = 0,  # output height (up-row zero-pad bounds)
    quant: str = "",  # "" exact | "dyn" in-kernel act quant | "static"
    out_q: bool = False,  # quantize the output to int8 (static scale)
    blk_store: bool = False,  # single per-step output DMA (n_fb == 1)
    pair: bool = False,  # two output rows per matmul (see wrapper gate)
    npair: bool = False,  # two row-steps per matmul along N (shared lhs)
):
    nw = 1 + int(head)
    upc = up_cd > 0
    it = iter(refs)
    xs = [next(it) for _ in range(n_in)]
    w_hbm = next(it)
    h_hbm = next(it) if head else None
    b_hbm = next(it)
    # (F+8, 128) f32: rows 0..F-1 per-channel dequant scales (static mode:
    # pre-multiplied by the input activation scale, and 1/out_scale is
    # pre-folded into them and the bias by the wrapper); rows F..F+7 are
    # DMA-tiling padding the kernel never reads
    ws_hbm = next(it) if (quant or out_q) else None
    wt_hbm = next(it) if upc else None
    bt_hbm = next(it) if upc else None
    o_hbm = next(it)
    pool_hbm = next(it) if pool else None
    xs_v = [next(it) for _ in range(n_in)]
    w_v = next(it)
    h_v = next(it) if head else None
    b_v = next(it)
    ws_v = next(it) if (quant or out_q) else None
    if upc:
        wt_v = next(it)
        bt_v = next(it)
        up_v = next(it)
    xq_v = [next(it) for _ in range(n_in)] if quant == "dyn" else None
    y_v = next(it)
    p_v = next(it) if pool else None
    z_v = next(it)
    in_sem = next(it)
    o_sem = next(it)
    wb_sem = next(it)

    # grid (F blocks, row steps): weights for output channels
    # [fb*FB, (fb+1)*FB) stay VMEM-resident across a full row sweep (deep
    # levels' weight matrices exceed VMEM whole); inputs re-stream per
    # block (tiny at those levels). Row steps iterate fastest.
    fb = pl.program_id(0)
    g = pl.program_id(1)
    n_fb = pl.num_programs(0)
    steps = pl.num_programs(1)
    gg = fb * steps + g
    even = jax.lax.rem(gg, 2) == 0
    FO = F2 if head else F
    LB = P * WS  # lanes per row-block
    M = TR * LB

    def start_fetch(gn, s):
        for i in range(n_in):
            if upc and i == 1:
                # fused ConvTranspose: input 1 is the half-resolution deep
                # activation; its window spans the deep rows feeding up rows
                # [gn*TR-1, gn*TR+TR]
                pltpu.make_async_copy(
                    xs[1].at[pl.ds(gn * (TR // 2) * up_cd,
                                   (TR // 2 + 2) * up_cd), :],
                    xs_v[1].at[s],
                    in_sem.at[s, 1],
                ).start()
            else:
                pltpu.make_async_copy(
                    xs[i].at[pl.ds(gn * TR * C[i], (TR + 2) * C[i]), :],
                    xs_v[i].at[s],
                    in_sem.at[s, i],
                ).start()

    def wait_fetch(s):
        for i in range(n_in):
            rows = (TR // 2 + 2) * up_cd if (upc and i == 1) else (TR + 2) * C[i]
            pltpu.make_async_copy(
                xs[i].at[pl.ds(0, rows), :], xs_v[i].at[s],
                in_sem.at[s, i],
            ).wait()

    @pl.when(gg == 0)
    def _():
        start_fetch(0, 0)
        if head:
            cp = pltpu.make_async_copy(h_hbm, h_v, wb_sem)
            cp.start()
            cp.wait()
        if quant or out_q:
            cp = pltpu.make_async_copy(ws_hbm, ws_v, wb_sem)
            cp.start()
            cp.wait()
        if upc:
            cp = pltpu.make_async_copy(wt_hbm, wt_v, wb_sem)
            cp.start()
            cp.wait()
            cp = pltpu.make_async_copy(bt_hbm, bt_v, wb_sem)
            cp.start()
            cp.wait()
        cp = pltpu.make_async_copy(b_hbm, b_v, wb_sem)
        cp.start()
        cp.wait()
        z_v[:, :] = jnp.zeros((FB, LB), z_v.dtype)

    WR = (6 if pair else 3) * FB  # weight-block rows

    @pl.when(g == 0)
    def _():
        cp = pltpu.make_async_copy(
            w_hbm.at[pl.ds(fb * WR, WR), :], w_v, wb_sem
        )
        cp.start()
        cp.wait()

    nxt_g = jnp.where(g + 1 < steps, g + 1, 0)
    more = (g + 1 < steps) | (fb + 1 < n_fb)

    @pl.when(more & even)
    def _():
        start_fetch(nxt_g, 1)

    @pl.when(more & jnp.logical_not(even))
    def _():
        start_fetch(nxt_g, 0)

    @pl.when(even)
    def _():
        wait_fetch(0)

    @pl.when(jnp.logical_not(even))
    def _():
        wait_fetch(1)

    slot = jax.lax.rem(gg, 2)

    def mm(lhs, rhs):
        return jax.lax.dot_general(
            lhs, rhs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    sumC = sum(C)
    w_lhs = w_v[:, :][:, 0 : (4 if pair else 3) * sumC]

    lane = jax.lax.broadcasted_iota(jnp.int32, (FB, LB), 1)
    p = lane >> 7
    u = lane & (WS - 1)
    zero = jnp.float32(0.0)
    not_x0 = jnp.logical_not((p == 0) & (u == 0))
    not_xl = jnp.logical_not((p == P - 1) & (u == WU - 1))
    if head:
        u2 = jax.lax.broadcasted_iota(jnp.int32, (F2, LB), 1) & (WS - 1)
        h2 = h_v[:, :][:, 0:F]
        hb = b_v[F : F + F2, 0:1].astype(jnp.float32)
    bias = b_v[pl.ds(fb * FB, FB), 0:1].astype(jnp.float32)

    # output DMAs are double-buffered: step gg's stores drain while step
    # gg+1 computes (waited before gg+2 reuses the staging slot)
    OUTR = FO if head else FB

    def wait_out(s):
        if blk_store:
            # one DMA per step: the TR output row-blocks are contiguous
            # in HBM when a single F block sweeps the rows (saves TR-1
            # DMA issues per step — ~1-2 us each, thousands per net)
            pltpu.make_async_copy(
                y_v.at[s], o_hbm.at[pl.ds(0, TR * OUTR), :], o_sem.at[s]
            ).wait()
            if pool:
                pltpu.make_async_copy(
                    p_v.at[s], pool_hbm.at[pl.ds(0, (TR // 2) * F), :],
                    o_sem.at[s],
                ).wait()
            return
        for t in range(TR):
            pltpu.make_async_copy(
                y_v.at[s, :, pl.ds(t * LB, LB)],
                o_hbm.at[pl.ds(0, OUTR), :],
                o_sem.at[s],
            ).wait()
        if pool:
            for sp in range(TR // 2):
                pltpu.make_async_copy(
                    p_v.at[s, :, pl.ds(sp * (LB // 2), LB // 2)],
                    pool_hbm.at[pl.ds(0, FB), :],
                    o_sem.at[s],
                ).wait()

    @pl.when(gg >= 2)
    def _():
        wait_out(slot)

    # fused ConvTranspose: materialize the up window for this step's rows
    # in VMEM from the deep fetch — up_v plays the role of input 1's
    # (TR+2)-row window, so the conv's rhs indexing below is unchanged.
    # Values are bit-identical to the standalone convt2x2_phase kernel
    # (same f32 matmul + bias + WU mask + bf16 rounding).
    if upc:
        C2 = C[1]
        Pd = P // 2
        bt = bt_v[:, 0:1].astype(jnp.float32)
        ud = jax.lax.broadcasted_iota(jnp.int32, (C2, Pd * WS), 1) & (WS - 1)
        for qi in range(TR // 2 + 2):
            drow = xs_v[1][slot][qi * up_cd : (qi + 1) * up_cd, :]
            A_t = jax.lax.dot_general(
                wt_v[:, :], drow,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (4*C2, Pd*WS)
            Ay = []
            for jj in range(4):
                yj = A_t[jj * C2 : (jj + 1) * C2, :] + bt
                yj = jnp.where(ud < WU, yj, jnp.float32(0.0))
                Ay.append(yj.astype(jnp.bfloat16))
            for dy in range(2):
                r_rel = 2 * qi + dy - 1
                if 0 <= r_rel <= TR + 1:
                    row = jnp.concatenate(
                        [
                            Ay[2 * dy + dx][:, pp * WS : (pp + 1) * WS]
                            for pp in range(Pd)
                            for dx in range(2)
                        ],
                        axis=1,
                    )
                    # up rows -1 and up_h are the conv's zero padding, NOT
                    # convT(0) + bias
                    r_abs = g * TR - 1 + r_rel
                    valid = (r_abs >= 0) & (r_abs < up_h)
                    up_v[r_rel * C2 : (r_rel + 1) * C2, :] = jnp.where(
                        valid, row, jnp.bfloat16(0)
                    )

    # int8 path: quantize this step's fetched window(s) ONCE (per-lane
    # symmetric scale shared across ALL K rows so it factors out of the
    # matmul's output columns), then the row loop issues int8 MXU matmuls
    # and dequantizes the int32 accumulator BEFORE the tap rolls (a rolled
    # lane's value came from a different column scale, so scaling must
    # precede the roll). Weights carry per-output-channel scales (ws_v).
    if quant == "dyn":
        amax = None
        for i in range(n_in):
            wf = jnp.abs(xs_v[i][slot][:, :].astype(jnp.float32))
            mi = jnp.max(wf, axis=0, keepdims=True)  # (1, LB)
            amax = mi if amax is None else jnp.maximum(amax, mi)
        sxf = amax * jnp.float32(1.0 / 127.0)  # (1, LB) dequant scale
        inv = jnp.where(amax > 0, jnp.float32(127.0) / amax, jnp.float32(0.0))
        for i in range(n_in):
            xf = xs_v[i][slot][:, :].astype(jnp.float32) * inv
            xq_v[i][:, :] = jnp.clip(
                jnp.rint(xf), -127.0, 127.0
            ).astype(jnp.int8)
        wsb = ws_v[pl.ds(fb * FB, FB), 0:1]  # (FB, 1) f32
        dq = wsb * sxf  # (FB, LB) combined dequant scale
    elif quant == "static":
        # per-channel weight scale x input activation scale (pre-folded by
        # the wrapper); a single per-output-row dequant after the i32
        # tap combine (uniform per-tensor act scale commutes with rolls)
        dq = ws_v[pl.ds(fb * FB, FB), 0:1]  # (FB, 1) f32
    # out_q: 1/out_scale is pre-folded into the dequant scales and bias by
    # the wrapper (a (1,1)->(FB,LB) broadcast is unsupported by Mosaic), so
    # quantizing the output is just rint+clip

    # one matmul per image row directly on the fetched window — rows
    # [t*C, (t+3)*C) of the block ARE the dy-stacked taps, so no P matrix
    # is ever materialized (saves a (3C, TR*LB) VPU copy per step).
    # ``pair`` mode (wrapper gate): one matmul per ROW PAIR over the
    # 4-row-block union window with the block-diagonal pair weights
    # ((6FB, 4sumC): [[W0 W1 W2 0],[0 W0 W1 W2]] per input) — +33% FLOPs
    # for fully-tiled M/K where the per-row (3FB, 3sumC) matmul fragments
    # MXU tiles (K=M=192 at L0: 56% ceiling, PROFILE_r04.md).
    y_ts = []
    Ai_pair = None

    def winslice(tt, rows=3):
        if n_in == 1:
            return xs_v[0][slot][tt * C[0] : (tt + rows) * C[0], :]
        return jnp.concatenate(
            [xs_v[i][slot][tt * C[i] : (tt + rows) * C[i], :]
             for i in range(n_in)],
            axis=0,
        )

    for t in range(TR):
        skip_tail = False
        if pair and t % 2 == 0:
            Ai_pair = jax.lax.dot_general(
                w_lhs, winslice(t, rows=4),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=(
                    jnp.int32 if quant == "static" else jnp.float32
                ),
            )  # (6*FB, LB)
        elif npair and t % 2 == 0:
            # shared-lhs N-doubling: both row-steps' windows ride one
            # matmul as lane-concatenated rhs — same FLOPs, twice the
            # streamed N per weight residency (deep levels' N = P*WS is
            # down to 256 lanes; longer N amortizes per-dot overheads)
            rhs_n = jnp.concatenate([winslice(t), winslice(t + 1)], axis=1)
            Ai_pair = jax.lax.dot_general(
                w_lhs, rhs_n,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=(
                    jnp.int32 if quant == "static" else jnp.float32
                ),
            )  # (3*FB, 2*LB)
        if quant == "static":
            # int8 window straight from HBM (no in-kernel quantize pass);
            # tap combine entirely in i32 — the uniform activation scale
            # commutes with the lane rolls — then ONE fused dequant.
            if pair:
                h3 = (t % 2) * 3 * FB
                Ai = Ai_pair[h3 : h3 + 3 * FB, :]
            elif npair:
                Ai = Ai_pair[:, (t % 2) * LB : (t % 2 + 1) * LB]
            else:
                Ai = jax.lax.dot_general(
                    w_lhs, winslice(t),
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (3*FB, LB) i32
            A0i, A1i, A2i = Ai[0:FB, :], Ai[FB : 2 * FB, :], Ai[2 * FB :, :]
            iz = jnp.int32(0)
            if P > 1:
                left_i = jnp.where(
                    p > 0,
                    pltpu.roll(A0i, WS, axis=1),
                    pltpu.roll(A0i, (LB + 1 - (P - 1) * WS) % LB, axis=1),
                )
                right_i = jnp.where(
                    p < P - 1,
                    pltpu.roll(A2i, LB - WS, axis=1),
                    pltpu.roll(A2i, ((P - 1) * WS - 1) % LB, axis=1),
                )
            else:
                left_i = pltpu.roll(A0i, 1, axis=1)
                right_i = pltpu.roll(A2i, LB - 1, axis=1)
            y_i = (A1i + jnp.where(not_x0, left_i, iz)
                   + jnp.where(not_xl, right_i, iz))
            y = y_i.astype(jnp.float32) * dq + bias
            if relu:
                y = jnp.maximum(y, zero)
            y = jnp.where(u < WU, y, zero)
            skip_tail = True
        elif quant == "dyn":
            if n_in == 1:
                rhs_q = xq_v[0][t * C[0] : (t + 3) * C[0], :]
            else:
                rhs_q = jnp.concatenate(
                    [xq_v[i][t * C[i] : (t + 3) * C[i], :] for i in range(n_in)],
                    axis=0,
                )
            Ai = jax.lax.dot_general(
                w_lhs, rhs_q,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )  # (3*FB, LB) i32
            A0 = Ai[0:FB, :].astype(jnp.float32) * dq
            A1 = Ai[FB : 2 * FB, :].astype(jnp.float32) * dq
            A2 = Ai[2 * FB :, :].astype(jnp.float32) * dq
        else:
            if pair:
                h3 = (t % 2) * 3 * FB
                A = Ai_pair[h3 : h3 + 3 * FB, :]
            elif npair:
                A = Ai_pair[:, (t % 2) * LB : (t % 2 + 1) * LB]
            else:
                if n_in == 1:
                    rhs = xs_v[0][slot][t * C[0] : (t + 3) * C[0], :]
                else:
                    def tap(i):
                        if upc and i == 1:
                            return up_v[t * C[1] : (t + 3) * C[1], :]
                        return xs_v[i][slot][t * C[i] : (t + 3) * C[i], :]

                    rhs = jnp.concatenate([tap(i) for i in range(n_in)], axis=0)
                A = mm(w_lhs, rhs)  # (3*FB, LB) f32
            A0, A1, A2 = A[0:FB, :], A[FB : 2 * FB, :], A[2 * FB :, :]

        # timing ablation knob (scripts/profile_conv_levels.py): "noroll"
        # drops the dx taps entirely (WRONG VALUES — upper bound only);
        # "bf16" runs the tap-combine epilogue in bf16
        abl = "" if skip_tail else os.environ.get("RTNR_PHASE_ABLATE", "")
        if skip_tail:
            pass
        elif abl == "noroll":
            y = A1 + bias
            if relu:
                y = jnp.maximum(y, zero)
            y = jnp.where(u < WU, y, zero)
        elif abl == "bf16":
            A0b = A0.astype(jnp.bfloat16)
            A1b = A1.astype(jnp.bfloat16)
            A2b = A2.astype(jnp.bfloat16)
            zb = jnp.bfloat16(0)
            if P > 1:
                left = jnp.where(
                    p > 0,
                    pltpu.roll(A0b, WS, axis=1),
                    pltpu.roll(A0b, (LB + 1 - (P - 1) * WS) % LB, axis=1),
                )
                right = jnp.where(
                    p < P - 1,
                    pltpu.roll(A2b, LB - WS, axis=1),
                    pltpu.roll(A2b, ((P - 1) * WS - 1) % LB, axis=1),
                )
            else:
                left = pltpu.roll(A0b, 1, axis=1)
                right = pltpu.roll(A2b, LB - 1, axis=1)
            y = (A1b + jnp.where(not_x0, left, zb)
                 + jnp.where(not_xl, right, zb) + bias.astype(jnp.bfloat16))
            if relu:
                y = jnp.maximum(y, zb)
            y = jnp.where(u < WU, y, zb)
        else:
            # left tap x-1: phase p-1 same u, or (phase P-1, u-1) at p==0
            if P > 1:
                left = jnp.where(
                    p > 0,
                    pltpu.roll(A0, WS, axis=1),
                    pltpu.roll(A0, (LB + 1 - (P - 1) * WS) % LB, axis=1),
                )
            else:
                left = pltpu.roll(A0, 1, axis=1)
            y = A1 + jnp.where(not_x0, left, zero)

            # right tap x+1: phase p+1 same u, or (phase 0, u+1) at p==P-1
            if P > 1:
                right = jnp.where(
                    p < P - 1,
                    pltpu.roll(A2, LB - WS, axis=1),
                    pltpu.roll(A2, ((P - 1) * WS - 1) % LB, axis=1),
                )
            else:
                right = pltpu.roll(A2, LB - 1, axis=1)
            y = y + jnp.where(not_xl, right, zero)

            y = y + bias
            if relu:
                y = jnp.maximum(y, zero)
            y = jnp.where(u < WU, y, zero)

        if head:  # n_fb == 1 (asserted by the wrapper)
            y = mm(h2, y.astype(jnp.bfloat16)) + hb
            y = jnp.where(u2 < WU, y, zero)

        if out_q:
            lo = jnp.float32(0.0) if relu else jnp.float32(-127.0)
            y_b = jnp.clip(
                jnp.rint(y.astype(jnp.float32)), lo, 127.0
            ).astype(jnp.int8)
        else:
            y_b = y.astype(jnp.bfloat16)
        if pool:
            y_ts.append(y_b)
        if blk_store:
            y_v[slot, pl.ds(t * OUTR, OUTR), :] = y_b
        else:
            y_v[slot, :, pl.ds(t * LB, LB)] = y_b
            pltpu.make_async_copy(
                y_v.at[slot, :, pl.ds(t * LB, LB)],
                o_hbm.at[pl.ds((1 + g * TR + t) * FO + (0 if head else fb * FB),
                               OUTR), :],
                o_sem.at[slot],
            ).start()

    if blk_store:
        pltpu.make_async_copy(
            y_v.at[slot],
            o_hbm.at[pl.ds((1 + g * TR) * FO, TR * OUTR), :],
            o_sem.at[slot],
        ).start()

    if pool:
        # out phase q = max over phases 2q, 2q+1 and image-row pair.
        # int8 vector max is not legalized by Mosaic — widen to i32 for
        # the comparisons and cast back (values are exact small ints).
        wdt = jnp.int32 if out_q else jnp.bfloat16
        for s in range(TR // 2):
            pm = jnp.maximum(y_ts[2 * s].astype(wdt),
                             y_ts[2 * s + 1].astype(wdt))
            cols = [
                jnp.maximum(pm[:, (2 * q) * WS : (2 * q + 1) * WS],
                            pm[:, (2 * q + 1) * WS : (2 * q + 2) * WS])
                for q in range(P // 2)
            ]
            prow = jnp.concatenate(cols, axis=1).astype(y_v.dtype)
            if blk_store:
                p_v[slot, pl.ds(s * F, F), :] = prow
            else:
                p_v[slot, :, pl.ds(s * (LB // 2), LB // 2)] = prow
        if blk_store:
            pltpu.make_async_copy(
                p_v.at[slot],
                pool_hbm.at[pl.ds((1 + g * (TR // 2)) * F, (TR // 2) * F), :],
                o_sem.at[slot],
            ).start()
        else:
            for s in range(TR // 2):
                pltpu.make_async_copy(
                    p_v.at[slot, :, pl.ds(s * (LB // 2), LB // 2)],
                    pool_hbm.at[
                        pl.ds((1 + g * (TR // 2) + s) * F + fb * FB, FB), :
                    ],
                    o_sem.at[slot],
                ).start()

    # final step drains its own stores and (if any) the previous step's
    total = n_fb * steps

    @pl.when(gg == total - 1)
    def _():
        wait_out(slot)

    @pl.when((gg == total - 1) & (total >= 2))
    def _():
        wait_out(1 - slot)

    # zero pad blocks (each F block writes its channel slice)
    @pl.when(g == 0)
    def _():
        d1 = pltpu.make_async_copy(
            z_v.at[pl.ds(0, FB if not head else FO), pl.ds(0, LB)],
            o_hbm.at[pl.ds(0 if head else fb * FB, FB if not head else FO), :],
            wb_sem,
        )
        d1.start()
        d1.wait()
        if pool:
            d2 = pltpu.make_async_copy(
                z_v.at[pl.ds(0, FB), pl.ds(0, LB // 2)],
                pool_hbm.at[pl.ds(fb * FB, FB), :],
                wb_sem,
            )
            d2.start()
            d2.wait()

    @pl.when(g == steps - 1)
    def _():
        d1 = pltpu.make_async_copy(
            z_v.at[pl.ds(0, FB if not head else FO), pl.ds(0, LB)],
            o_hbm.at[
                pl.ds((steps * TR + 1) * FO + (0 if head else fb * FB),
                      FB if not head else FO),
                :,
            ],
            wb_sem,
        )
        d1.start()
        d1.wait()
        if pool:
            d2 = pltpu.make_async_copy(
                z_v.at[pl.ds(0, FB), pl.ds(0, LB // 2)],
                pool_hbm.at[pl.ds((steps * (TR // 2) + 1) * F + fb * FB, FB), :],
                wb_sem,
            )
            d2.start()
            d2.wait()


def _pick_tr_fb(
    h: int, P: int, Cs: Tuple[int, ...], F: int, pool: bool, head: bool,
    up_cd: int = 0, quant: bool = False, out_q: bool = False,
    pair: bool = False, npair: bool = False,
) -> Tuple[int, int]:
    """Largest (rows-per-step, F-block) whose VMEM footprint fits (~13 MB
    of the 16 MB scoped limit), per the kernel's scratch + live values."""
    # headroom for Mosaic's own stack temporaries (rolled/selected copies
    # of the f32 accumulator etc.) — 13 MB overflowed by 0.4 MB at the
    # bottleneck shapes
    budget = 11_000_000
    sumC = sum(Cs)
    lb = P * WS
    # tiny-C convs (the 5ch input, 8 stored channels) are per-step
    # overhead-bound at TR=8 (136 steps x ~6 GFLOP total — hlo_stats r4:
    # ~1 ms); larger row steps amortize it and still fit VMEM
    for tr in (32, 16, 8, 4, 2):
        if h % tr or (pool and tr % 2) or (up_cd and tr % 2):
            continue
        base = 0
        for i, c in enumerate(Cs):
            if up_cd and i == 1:
                # fused ConvTranspose: deep fetch (half rows, half lanes)
                # + the materialized up window + convT weights/accumulator
                base += 2 * (tr // 2 + 2) * up_cd * (lb // 2) * 2
                base += (tr + 2) * c * lb * 2  # up_v staging
                base += 2 * 4 * c * up_cd * 2  # wt (scratch + loaded value)
                base += 4 * c * (lb // 2) * 4  # A_t f32 (dies per deep row)
            else:
                # fetch windows, 2 slots (int8 in static mode)
                base += 2 * (tr + 2) * c * lb * (1 if quant == "static" else 2)
            if quant == "dyn":
                base += (tr + 2) * c * lb  # int8 quantized window copy
        fbs = [F] if head else [f for f in (F, F // 2, F // 4, F // 8)
                                if f >= 8 and f % 8 == 0]
        if quant:  # int8 weight-block DMA rows (3*FB) must tile (32, 128)
            fbs = [f for f in fbs if (3 * f) % 32 == 0 or f == F]
        wrows = 6 if pair else 3  # pair mode: (6FB, 4sumC) weight block
        k128 = _round_up((4 if pair else 3) * sumC, 128)
        wbytes = 1 if quant else 2
        ybytes = 1 if out_q else 2  # int8-quantized outputs halve staging
        for fbl in fbs:
            if up_cd and fbl != F:
                continue  # fused path requires a single F block
            if tr > 8 and fbl != F:
                continue  # big row steps must not cost F-block residency
            est = (
                base
                # weight block counts twice: the VMEM scratch AND the value
                # the matmul loads from it (measured 16.4M scoped at the
                # bottleneck when counted once)
                + 2 * wrows * fbl * k128 * wbytes
                # per-row/pair A accumulator (npair: (3FB, 2LB) + the rhs
                # lane-concat copy)
                + wrows * fbl * lb * 4 * (2 if npair else 1)
                + (3 * sumC * 2 * lb * wbytes if npair else 0)
                + 2 * fbl * tr * lb * ybytes * (2 if pool else 1)  # y/pool x2
            )
            if est <= budget:
                return tr, fbl
    return 2, 8


def fuse_up_ok(h: int, P: int, c_skip: int, c_up: int, up_cd: int, F: int) -> bool:
    """Whether the fused-ConvTranspose conv fits VMEM with a single F block
    at this level (the fusion requires n_fb == 1: an F-blocked sweep would
    recompute the up window once per block)."""
    tr, fb = _pick_tr_fb(h, P, (c_skip, c_up), F, False, False, up_cd)
    return fb == F and tr % 2 == 0 and h % tr == 0


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "P", "relu", "pool", "rows_per_step",
                     "interpret", "quant"),
)
def conv3x3_phase(
    xs: Sequence[jax.Array],
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    head_kernel: Optional[jax.Array] = None,
    head_bias: Optional[jax.Array] = None,
    up_kernel: Optional[jax.Array] = None,
    up_bias: Optional[jax.Array] = None,
    *,
    h: int,
    w: int,
    P: int,
    relu: bool = False,
    pool: bool = False,
    rows_per_step: Optional[int] = None,
    interpret: bool = False,
    quant: Any = False,
    in_scales: Optional[Sequence[jax.Array]] = None,
    out_scale: Optional[jax.Array] = None,
):
    """3x3 s1 same conv over the channel-concat of packed phase-planar
    inputs at P phases; optional fused ReLU, 2x2-max-pool side output
    (packed at P/2 phases), and fused 1x1 head (applied after ReLU; head
    output channels pad to 8). Returns (out,) / (out, pooled).

    With ``up_kernel`` (2, 2, C_deep, C_up), input 1 is the HALF-resolution
    deep activation (P/2 phases, h/2 rows) and the 2x2-stride-2 transposed
    conv is fused into this kernel: the up window materializes in VMEM per
    row step (bit-identical values to ``convt2x2_phase``), skipping one
    full-resolution activation round-trip through HBM per decoder level.

    ``quant=True`` runs the matmuls on the int8 MXU path (2x bf16 peak on
    v5e): weights are quantized per-output-channel, activations per-lane
    per row-step inside the kernel (windows stay bf16 in HBM). Approximate
    — error budget pinned by tests/test_conv_phase.py; the reference
    itself ships precision-degraded fp16 inference (model/export_ts.py:16).
    """
    n_in = len(xs)
    assert n_in in (1, 2)
    assert w % P == 0 and w // P <= WS
    upc = up_kernel is not None
    if quant is True:
        quant = "dyn"
    elif not quant:
        quant = ""
    assert quant in ("", "dyn", "static")
    assert not (quant and upc), "int8 path does not fuse ConvTranspose"
    head = head_kernel is not None
    out_q = out_scale is not None
    assert not (head and out_q), "the fused head output stays bf16"
    if quant == "static":
        assert in_scales is not None and len(in_scales) == n_in
        assert all(x.dtype == jnp.int8 for x in xs)
    else:
        assert all(x.dtype == jnp.bfloat16 for x in xs)
    if upc:
        assert n_in == 2 and not pool and P % 2 == 0
        up_cd = int(up_kernel.shape[2])
        Cs = (int(xs[0].shape[0]) // (h + 2), int(up_kernel.shape[3]))
        assert int(xs[1].shape[0]) // (h // 2 + 2) == up_cd
        assert xs[1].shape[1] == (P // 2) * WS
    else:
        up_cd = 0
        Cs = tuple(int(x.shape[0]) // (h + 2) for x in xs)
    sumC = sum(Cs)
    F = kernel.shape[-1]
    assert not (head and pool)
    assert quant != "static" or interpret or (
        F % 32 == 0 and all(c % 32 == 0 for c in Cs)
    ), "static int8 DMA tiling needs 32-row-aligned channel counts"
    tr_auto, FB = _pick_tr_fb(h, P, Cs, F, pool, head, up_cd, quant, out_q)
    TR = rows_per_step or tr_auto

    # pair mode: two output rows per matmul over the 4-row-block union
    # window. Profitable exactly when the padded-tile MXU work shrinks:
    # ru(6FB,128) * ru(4sumC,128) < 2 * ru(3FB,128) * ru(3sumC,128) —
    # at L0 (FB=sumC=64): 384x256 vs 2x 256x256, a 25% hardware-work cut
    # for +33% logical FLOPs (K=M=192 fragments 1.5x1.5 tiles,
    # PROFILE_r04.md). RTNR_PHASE_PAIR=0 disables (measured foil knob).
    def _pair_profitable(fbl):
        return (
            _round_up(6 * fbl, 128) * _round_up(4 * sumC, 128)
            < 2 * _round_up(3 * fbl, 128) * _round_up(3 * sumC, 128)
        )

    pair = (
        os.environ.get("RTNR_PHASE_PAIR", "1") == "1"
        and not upc and quant != "dyn"
        and TR % 2 == 0
        and _pair_profitable(FB)
        and (not quant or (6 * FB) % 32 == 0)
    )
    if pair and rows_per_step is None:
        # re-pick with the pair VMEM accounting (bigger weight block +
        # (6FB, LB) accumulator)
        tr_auto, FB = _pick_tr_fb(h, P, Cs, F, pool, head, up_cd, quant,
                                  out_q, pair=True)
        TR = tr_auto
        pair = (TR % 2 == 0 and _pair_profitable(FB)
                and (not quant or (6 * FB) % 32 == 0))
    # shared-lhs N-doubling: measured a LOSS on v5e (static per-level,
    # scripts/profile_conv_levels.py r5: L2 0.60 vs 0.64 but L3 6.92 vs
    # 0.62 and bottleneck 0.60 vs 0.42 — the rhs lane-concat copy and
    # doubled accumulator swamp the small-N amortization). Kept as a
    # measured foil: RTNR_PHASE_NPAIR=1 enables.
    npair = (
        os.environ.get("RTNR_PHASE_NPAIR", "0") == "1"
        and not pair and not upc and quant != "dyn"
        and TR % 2 == 0
    )
    if npair and rows_per_step is None:
        tr_auto, FB = _pick_tr_fb(h, P, Cs, F, pool, head, up_cd, quant,
                                  out_q, npair=True)
        TR = tr_auto
        npair = TR % 2 == 0
    n_fb = F // FB
    assert h % TR == 0 and (not pool or (TR % 2 == 0 and P % 2 == 0))
    assert not upc or (n_fb == 1 and TR % 2 == 0)
    steps = h // TR
    F2 = _round_up(head_kernel.shape[-1], 8) if head else F

    kc = kernel.shape[2]
    if kc < sumC:  # zero-weight rows for stored channel padding
        kernel = jnp.concatenate(
            [kernel, jnp.zeros((3, 3, sumC - kc, F), kernel.dtype)], axis=2
        )
    inv_out = (
        jnp.float32(1.0) / out_scale.astype(jnp.float32)
        if out_q else jnp.float32(1.0)
    )
    swv = None
    if not quant and out_q:
        # exact-path matmul with quantized output: fold 1/out_scale into
        # the weights (the bias is folded below) so the kernel's output
        # quantize is a plain rint+clip
        kernel = kernel.astype(jnp.float32) * inv_out
    if quant:
        # per-output-channel symmetric int8 (the scale rides a (F, 128)
        # broadcast column like the bias). Static mode folds the SECOND
        # input's activation-scale ratio into its weight slice so the
        # whole contraction runs at input 0's scale (exact factorization
        # for the two-input virtual concat), then pre-multiplies the
        # dequant scale by s_in0.
        kf = kernel.astype(jnp.float32)
        if quant == "static" and n_in == 2:
            ratio = (in_scales[1] / in_scales[0]).astype(jnp.float32)
            kf = jnp.concatenate(
                [kf[:, :, : Cs[0]], kf[:, :, Cs[0] :] * ratio], axis=2
            )
        swv = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 1, 2)),
                          jnp.float32(1e-12)) * jnp.float32(1.0 / 127.0)
        kernel = jnp.clip(jnp.rint(kf / swv), -127.0, 127.0)
    kparts = []
    off = 0
    for c in Cs:
        kp = kernel[:, :, off : off + c, :]
        off += c
        kparts.append(kp.transpose(1, 3, 0, 2).reshape(3 * F, 3 * c))
    wdt = jnp.int8 if quant else jnp.bfloat16
    if pair:
        # block-diagonal pair weights: per input, row-t block [Wdy | 0_c]
        # and row-(t+1) block [0_c | Wdy] over the 4-row-block union
        # window; rows ordered (half, dx, f)
        tops, bots = [], []
        for i, c in enumerate(Cs):
            kp = kparts[i]  # (3F, 3c), rows (dx, f)
            z = jnp.zeros((3 * F, c), kp.dtype)
            tops.append(jnp.concatenate([kp, z], axis=1))
            bots.append(jnp.concatenate([z, kp], axis=1))
        w2 = jnp.concatenate(
            [jnp.concatenate(tops, axis=1), jnp.concatenate(bots, axis=1)],
            axis=0,
        ).astype(wdt)  # (6F, 4sumC)
        K128 = _round_up(4 * sumC, 128)
        w2 = (
            w2.reshape(2, 3, n_fb, FB, 4 * sumC)
            .transpose(2, 0, 1, 3, 4)
            .reshape(n_fb * 6 * FB, 4 * sumC)
        )
        w2 = jnp.pad(w2, ((0, 0), (0, K128 - 4 * sumC)))
    else:
        w2 = jnp.concatenate(kparts, axis=1).astype(wdt)
        # rearrange into F blocks (block fb holds rows (dx, fb*FB + j)); the
        # K dim pads to a lane tile so the per-block DMA slice is legal
        # (sub-128 minor dims cannot be memref_sliced)
        K128 = _round_up(3 * sumC, 128)
        w2 = (
            w2.reshape(3, n_fb, FB, 3 * sumC)
            .transpose(1, 0, 2, 3)
            .reshape(n_fb * 3 * FB, 3 * sumC)
        )
        w2 = jnp.pad(w2, ((0, 0), (0, K128 - 3 * sumC)))

    bvec = jnp.zeros((F,), jnp.float32) if bias is None else bias
    if out_q:
        bvec = bvec.astype(jnp.float32) * inv_out
    brows = [jnp.broadcast_to(bvec.astype(jnp.bfloat16)[:, None], (F, 128))]
    args = list(xs) + [w2]
    if head:
        f2 = head_kernel.shape[-1]
        hk = head_kernel.astype(jnp.bfloat16).T
        if f2 < F2:
            hk = jnp.concatenate([hk, jnp.zeros((F2 - f2, F), jnp.bfloat16)])
        args.append(jnp.pad(hk, ((0, 0), (0, _round_up(F, 128) - F))))
        hb = jnp.zeros((f2,), jnp.float32) if head_bias is None else head_bias
        hb = jnp.concatenate(
            [hb.astype(jnp.float32), jnp.zeros((F2 - f2,), jnp.float32)]
        )
        brows.append(
            jnp.broadcast_to(hb.astype(jnp.bfloat16)[:, None], (F2, 128))
        )
    args.append(jnp.concatenate(brows, axis=0))
    if quant or out_q:
        if swv is None:
            sw_eff = jnp.ones((F,), jnp.float32)  # unused by the exact path
        elif quant == "static":
            sw_eff = swv * in_scales[0].astype(jnp.float32) * inv_out
        else:
            sw_eff = swv * inv_out
        ws_rows = jnp.concatenate([
            jnp.broadcast_to(sw_eff[:, None], (F, 128)).astype(jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
        ])
        args.append(ws_rows)
    if upc:
        c2 = Cs[1]
        # flax ConvTranspose applies the SPATIALLY FLIPPED kernel (see
        # convt2x2_phase)
        wt = (
            up_kernel[::-1, ::-1].transpose(0, 1, 3, 2).reshape(4 * c2, up_cd)
            .astype(jnp.bfloat16)
        )
        btv = jnp.zeros((c2,), jnp.float32) if up_bias is None else up_bias
        args.append(wt)
        args.append(
            jnp.broadcast_to(btv.astype(jnp.bfloat16)[:, None], (c2, 128))
        )

    FO = F2 if head else F
    LB = P * WS
    odt = jnp.int8 if out_q else jnp.bfloat16
    out_shapes = [jax.ShapeDtypeStruct(((h + 2) * FO, LB), odt)]
    if pool:
        out_shapes.append(
            jax.ShapeDtypeStruct(((h // 2 + 2) * F, LB // 2), odt)
        )

    adt = jnp.int8 if quant == "static" else jnp.bfloat16  # input act dtype
    # single per-step output DMA when one F block sweeps the rows and the
    # staging sublane offsets stay tile-aligned (bf16: 16, int8: 32)
    blk_store = (
        n_fb == 1 and not head
        and F % (32 if out_q else 16) == 0
    )
    scratch = []
    for i, c in enumerate(Cs):
        if upc and i == 1:
            scratch.append(
                pltpu.VMEM((2, (TR // 2 + 2) * up_cd, LB // 2), jnp.bfloat16)
            )
        else:
            scratch.append(pltpu.VMEM((2, (TR + 2) * c, LB), adt))
    scratch += [pltpu.VMEM(((6 if pair else 3) * FB, K128),
                           jnp.int8 if quant else jnp.bfloat16)]
    if head:
        scratch += [pltpu.VMEM((F2, _round_up(F, 128)), jnp.bfloat16)]
    scratch += [pltpu.VMEM((F + (F2 if head else 0), 128), jnp.bfloat16)]
    if quant or out_q:
        scratch += [pltpu.VMEM((F + 8, 128), jnp.float32)]  # w scales + 1/s_out
    if upc:
        scratch += [
            pltpu.VMEM((4 * Cs[1], up_cd), jnp.bfloat16),
            pltpu.VMEM((Cs[1], 128), jnp.bfloat16),
            pltpu.VMEM(((TR + 2) * Cs[1], LB), jnp.bfloat16),  # up window
        ]
    if quant == "dyn":  # quantized window copies (consumed in-step)
        scratch += [
            pltpu.VMEM(((TR + 2) * c, LB), jnp.int8) for c in Cs
        ]
    if blk_store:
        scratch += [pltpu.VMEM((2, TR * F, LB), odt)]  # y x2 (row-blocked)
    else:
        scratch += [
            pltpu.VMEM((2, F2 if head else FB, TR * LB), odt),  # y x2
        ]
    if pool:
        scratch += [
            pltpu.VMEM((2, (TR // 2) * F, LB // 2), odt)
            if blk_store
            else pltpu.VMEM((2, FB, (TR // 2) * (LB // 2)), odt)
        ]
    scratch += [
        pltpu.VMEM((FB, LB), odt),  # zero pad block
        pltpu.SemaphoreType.DMA((2, n_in)),
        pltpu.SemaphoreType.DMA((2,)),  # double-buffered output stores
        pltpu.SemaphoreType.DMA(()),  # weights/bias/pad blocks
    ]

    outs = pl.pallas_call(
        functools.partial(
            _conv_phase_kernel,
            n_in=n_in,
            C=Cs,
            F=F,
            F2=F2,
            FB=FB,
            P=P,
            WU=w // P,
            TR=TR,
            relu=relu,
            pool=pool,
            head=head,
            up_cd=up_cd,
            up_h=h,
            quant=quant,
            out_q=out_q,
            blk_store=blk_store,
            pair=pair,
            npair=npair,
        ),
        out_shape=out_shapes,
        grid=(n_fb, steps),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(args),
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(out_shapes),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
    return tuple(outs)


def _convt_phase_kernel(
    *refs,
    C: int,
    F: int,
    P: int,  # input phases; output has 2P
    WU: int,
    TR: int,
    quant: bool = False,  # static int8: x int8, W int8, scales in ws
    out_q: bool = False,
    blk_store: bool = False,  # single per-step output DMA
):
    it = iter(refs)
    x_hbm = next(it)
    w_hbm = next(it)
    b_hbm = next(it)
    ws_hbm = next(it) if (quant or out_q) else None
    o_hbm = next(it)
    x_v = next(it)
    w_v = next(it)
    b_v = next(it)
    ws_v = next(it) if (quant or out_q) else None
    y_v = next(it)
    z_v = next(it)
    in_sem = next(it)
    o_sem = next(it)
    wb_sem = next(it)
    g = pl.program_id(0)
    steps = pl.num_programs(0)
    even = jax.lax.rem(g, 2) == 0
    LB = P * WS
    M = TR * LB
    LBO = 2 * LB

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
        cp = pltpu.make_async_copy(w_hbm, w_v, wb_sem)
        cp.start()
        cp.wait()
        cp = pltpu.make_async_copy(b_hbm, b_v, wb_sem)
        cp.start()
        cp.wait()
        if quant or out_q:
            cp = pltpu.make_async_copy(ws_hbm, ws_v, wb_sem)
            cp.start()
            cp.wait()
        z_v[:, :] = jnp.zeros((F, LBO), z_v.dtype)

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
    bias = b_v[:, 0:1].astype(jnp.float32)
    u = jax.lax.broadcasted_iota(jnp.int32, (F, LB), 1) & (WS - 1)
    if quant or out_q:
        # per-channel weight scale x input act scale, tiled over the 4
        # (dy, dx) sub-kernels (w4 rows are (dy*2+dx)*F + f); also carries
        # 1/out_scale when the output quantizes
        dq1 = ws_v[pl.ds(0, F), 0:1]  # (F, 1) f32

    # double-buffered output stores (drained before slot reuse)
    def wait_out(s):
        if blk_store:
            pltpu.make_async_copy(
                y_v.at[s], o_hbm.at[pl.ds(0, 2 * TR * F), :], o_sem.at[s]
            ).wait()
            return
        for j in range(2 * TR):
            pltpu.make_async_copy(
                y_v.at[s, :, pl.ds(j * LBO, LBO)],
                o_hbm.at[pl.ds(0, F), :],
                o_sem.at[s],
            ).wait()

    @pl.when(g >= 2)
    def _():
        wait_out(slot)

    # one matmul per input row on the fetched window directly (no staging
    # copy); out image row 2(g*TR+t)+dy, phase 2p+dx <- Ay[2*dy+dx] slot p
    for t in range(TR):
        A = jax.lax.dot_general(
            w_v[:, :], x_v[slot][t * C : (t + 1) * C, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32 if quant else jnp.float32,
        )  # (4F, LB)
        Ay = []
        for j in range(4):
            yj = A[j * F : (j + 1) * F, :]
            if quant or out_q:
                yj = yj.astype(jnp.float32) * dq1
            yj = yj + bias
            yj = jnp.where(u < WU, yj, jnp.float32(0.0))
            if out_q:
                yj = jnp.clip(jnp.rint(yj), -127.0, 127.0)
                Ay.append(yj.astype(jnp.int8))
            else:
                Ay.append(yj.astype(jnp.bfloat16))
        for dy in range(2):
            row = jnp.concatenate(
                [
                    Ay[2 * dy + dx][:, p * WS : (p + 1) * WS]
                    for p in range(P)
                    for dx in range(2)
                ],
                axis=1,
            )  # (F, LBO)
            if blk_store:
                y_v[slot, pl.ds((2 * t + dy) * F, F), :] = row
            else:
                y_v[slot, :, pl.ds((2 * t + dy) * LBO, LBO)] = row
                pltpu.make_async_copy(
                    y_v.at[slot, :, pl.ds((2 * t + dy) * LBO, LBO)],
                    o_hbm.at[pl.ds((1 + (g * TR + t) * 2 + dy) * F, F), :],
                    o_sem.at[slot],
                ).start()

    if blk_store:
        pltpu.make_async_copy(
            y_v.at[slot],
            o_hbm.at[pl.ds((1 + 2 * g * TR) * F, 2 * TR * F), :],
            o_sem.at[slot],
        ).start()

    @pl.when(g == steps - 1)
    def _():
        wait_out(slot)

    @pl.when((g == steps - 1) & (steps >= 2))
    def _():
        wait_out(1 - slot)

    @pl.when(g == 0)
    def _():
        dma = pltpu.make_async_copy(z_v, o_hbm.at[pl.ds(0, F), :], wb_sem)
        dma.start()
        dma.wait()

    @pl.when(g == steps - 1)
    def _():
        dma = pltpu.make_async_copy(
            z_v, o_hbm.at[pl.ds((2 * steps * TR + 1) * F, F), :], wb_sem
        )
        dma.start()
        dma.wait()


@functools.partial(
    jax.jit,
    static_argnames=("h", "w", "P", "rows_per_step", "interpret", "quant"),
)
def convt2x2_phase(
    x: jax.Array,
    kernel: jax.Array,
    bias: Optional[jax.Array] = None,
    *,
    h: int,  # OUTPUT height
    w: int,  # OUTPUT width
    P: int,  # INPUT phases (output has 2P)
    rows_per_step: int = 4,
    interpret: bool = False,
    quant: Any = False,
    in_scale: Optional[jax.Array] = None,
    out_scale: Optional[jax.Array] = None,
) -> jax.Array:
    """2x2-stride-2 transposed conv: packed phase-planar (P phases,
    h/2 x w/2) in -> packed (2P phases, h x w) out. kernel (2, 2, C, F)
    (flax ConvTranspose HWIO, spatially flipped semantics), bias (F,)."""
    hh = h // 2
    C = x.shape[0] // (hh + 2)
    F = kernel.shape[-1]
    TR = rows_per_step
    assert hh % TR == 0 and x.shape[1] == P * WS and (w // 2) % P == 0
    steps = hh // TR
    if quant is True:
        quant = "static"
    elif not quant:
        quant = ""
    assert quant in ("", "static")
    out_q = out_scale is not None
    if quant:
        assert in_scale is not None and x.dtype == jnp.int8
        assert interpret or (F % 32 == 0 and C % 32 == 0)

    # flax ConvTranspose applies the SPATIALLY FLIPPED kernel; with stride
    # == kernel size output subpixel (dy, dx) reads kernel[1-dy, 1-dx]
    # (models/unet.py ConvTranspose2x2MatMul:115-118)
    w4f = kernel[::-1, ::-1].transpose(0, 1, 3, 2).reshape(4 * F, C)
    if quant:
        kf = w4f.astype(jnp.float32).reshape(4, F, C)
        swv = jnp.maximum(jnp.max(jnp.abs(kf), axis=(0, 2)),
                          jnp.float32(1e-12)) * jnp.float32(1.0 / 127.0)
        w4 = jnp.clip(jnp.rint(kf / swv[None, :, None]), -127.0, 127.0)
        w4 = w4.reshape(4 * F, C).astype(jnp.int8)
    else:
        w4 = w4f.astype(jnp.bfloat16)
    inv_out = (
        jnp.float32(1.0) / out_scale.astype(jnp.float32)
        if out_q else jnp.float32(1.0)
    )
    bvec = jnp.zeros((F,), jnp.float32) if bias is None else bias
    if out_q:
        bvec = bvec.astype(jnp.float32) * inv_out
    brow = jnp.broadcast_to(bvec.astype(jnp.bfloat16)[:, None], (F, 128))
    args = [x, w4, brow]
    if quant or out_q:
        # 1/out_scale folds into the per-channel dequant scale (and the
        # bias above): the kernel's output quantize is a plain rint+clip
        sw_eff = (
            swv * in_scale.astype(jnp.float32) * inv_out if quant
            else jnp.broadcast_to(inv_out, (F,))
        )
        args.append(jnp.concatenate([
            jnp.broadcast_to(sw_eff[:, None], (F, 128)).astype(jnp.float32),
            jnp.zeros((8, 128), jnp.float32),
        ]))
    odt = jnp.int8 if out_q else jnp.bfloat16
    adt = jnp.int8 if quant else jnp.bfloat16
    blk_store = F % (32 if out_q else 16) == 0
    scratch = [
        pltpu.VMEM((2, TR * C, P * WS), adt),
        pltpu.VMEM((4 * F, C), jnp.int8 if quant else jnp.bfloat16),
        pltpu.VMEM((F, 128), jnp.bfloat16),
    ]
    if quant or out_q:
        scratch.append(pltpu.VMEM((F + 8, 128), jnp.float32))
    scratch += [
        pltpu.VMEM((2, 2 * TR * F, 2 * P * WS), odt)
        if blk_store
        else pltpu.VMEM((2, F, 4 * TR * P * WS), odt),
        pltpu.VMEM((F, 2 * P * WS), odt),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA((2,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    out = pl.pallas_call(
        functools.partial(
            _convt_phase_kernel, C=C, F=F, P=P, WU=(w // 2) // P, TR=TR,
            quant=bool(quant), out_q=out_q, blk_store=blk_store,
        ),
        out_shape=jax.ShapeDtypeStruct(((h + 2) * F, 2 * P * WS), odt),
        grid=(steps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(*args)
    return out
