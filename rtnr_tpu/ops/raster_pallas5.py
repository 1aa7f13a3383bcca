"""Pallas TPU resolve v5: pixel-only sort + segmented-min winners kernel.

v4 (ops/raster_pallas4.py) consumes a (pixel, depth)-sorted stream: the
two-key sort costs 8.74 ms marginal at 5M elements on v5e, while the same
sort with ONE key (pixel only) costs 5.35 ms (scripts/profile_sort3.py).
Depth order inside a pixel segment is only used by v4 to make the segment
head the minimum and the 2 cm band a prefix — both are order-free
quantities:

- per-pixel min depth  = a segmented MIN over the segment (any order);
- band membership      = z <= min + 0.02 per element (reference
  render.cu:101-106 tests against the FINAL per-pixel min, so the set of
  admitted points is independent of traversal order);
- winner               = simply the LAST element of each segment.

v5 therefore sorts by pixel id alone (``project_and_sort(...,
depth_key=False)``) and computes the segment min in-kernel with a forward
+ backward segmented min-scan (lane rolls + an 8-row ladder, the same
Hillis-Steele machinery as v4's head broadcast). Contributions are weighted
by the in-band mask before the MXU cumulative-sum block-scan; everything
else (winner-rank compaction, factored one-hot placement, the expansion
kernel) is shared with v4.

Cross-part segments: the minimum is an associative carry (one scalar), but
in-band *contributions* of a part's trailing open segment depend on depths
seen later. The kernel therefore excludes the open segment's elements from
the carried cumulative sums (the carry is the pre-head prefix, which v4's
head-broadcast cascade already materializes) and RE-reduces them exactly in
the next part from a stashed copy of the previous part's data (one-part
lookback) once the true min is known. A segment whose elements span more
than two parts (> ~16k points on ONE pixel) sets a sticky overflow flag;
the wrapper then falls back via ``lax.cond`` to a depth-keyed re-sort + the
v4 path, so results are bit-exact for every input.

Semantics source: reference render.cu:53-163 (see ops/raster.py docstring).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtnr_tpu.ops.raster import SortedPoints

_I32 = jnp.int32
_FLT_MAX_BITS = 0x7F7FFFFF
_SENT = 0x7FFFFFFF  # min-scan identity (> any positive float's bits)


def _winners_kernel5(
    pix_hbm,  # (P*8+8, Lc) i32
    zb_hbm,
    packed_hbm,
    tri_hbm,  # (TS, TS) bf16 upper-triangular ones
    wout_hbm,  # (8, out_w) i32: rows r,g,b,count,zbits,pix,0,0 by winner rank
    flag_hbm,  # (8, 128) i32: sticky lookback-overflow flag (all lanes)
    pix_v,
    zb_v,
    packed_v,
    tri_v,
    prev_v,  # (3, 8, Lc) i32: previous part's pix/zb/packed (lookback)
    part_out,
    flag_v,
    carry,  # SMEM (18,)
    in_sem,
    tri_sem,
    out_sem,
    *,
    Lc: int,
    S: int,
    hw: int,
    depth_band: float,
):
    L = 8 * Lc
    p = pl.program_id(0)
    n_parts = pl.num_programs(0)
    even = jax.lax.rem(p, 2) == 0

    def start_fetch(part, s):
        pltpu.make_async_copy(
            pix_hbm.at[pl.ds(part * 8, 16), :], pix_v.at[s], in_sem.at[s, 0]
        ).start()
        pltpu.make_async_copy(
            zb_hbm.at[pl.ds(part * 8, 16), :], zb_v.at[s], in_sem.at[s, 1]
        ).start()
        pltpu.make_async_copy(
            packed_hbm.at[pl.ds(part * 8, 8), :], packed_v.at[s], in_sem.at[s, 2]
        ).start()

    def wait_fetch(s):
        pltpu.make_async_copy(pix_hbm.at[pl.ds(0, 16), :], pix_v.at[s], in_sem.at[s, 0]).wait()
        pltpu.make_async_copy(zb_hbm.at[pl.ds(0, 16), :], zb_v.at[s], in_sem.at[s, 1]).wait()
        pltpu.make_async_copy(packed_hbm.at[pl.ds(0, 8), :], packed_v.at[s], in_sem.at[s, 2]).wait()

    @pl.when(p == 0)
    def _():
        for i in range(18):
            carry[i] = 0
        carry[4] = -1  # open pix: nothing open
        carry[5] = _SENT  # open-segment running min: identity
        start_fetch(0, 0)
        pltpu.make_async_copy(tri_hbm, tri_v, tri_sem).start()
        pltpu.make_async_copy(tri_hbm, tri_v, tri_sem).wait()

    @pl.when((p + 1 < n_parts) & even)
    def _():
        start_fetch(p + 1, 1)

    @pl.when((p + 1 < n_parts) & jnp.logical_not(even))
    def _():
        start_fetch(p + 1, 0)

    @pl.when(even)
    def _():
        wait_fetch(0)

    @pl.when(jnp.logical_not(even))
    def _():
        wait_fetch(1)

    slot = jax.lax.rem(p, 2)
    pix16 = pix_v[slot]
    zb16 = zb_v[slot]
    pix = pix16[0:8, :]
    zb = zb16[0:8, :]
    packed = packed_v[slot]

    lane = jax.lax.broadcasted_iota(_I32, (8, Lc), 1)
    row8 = jax.lax.broadcasted_iota(_I32, (8, Lc), 0)
    ok = pix < hw
    real = (packed >> 24) & 1
    r = packed & 255
    g = (packed >> 8) & 255
    b = (packed >> 16) & 255

    def last_col(x):
        return pltpu.roll(x, 1, axis=1)[:, 0:1]

    pix_rolled = pltpu.roll(pix, 1, axis=1)
    prev_last = jnp.concatenate(
        [jnp.full((1, 1), carry[4], _I32), pix_rolled[0:7, 0:1]], axis=0
    )
    prev_pix = jnp.where(lane == 0, prev_last, pix_rolled)
    is_head = pix != prev_pix
    next_pix = jnp.where(
        lane == Lc - 1, pix16[1:9, 0:1], pltpu.roll(pix, Lc - 1, axis=1)
    )
    is_last = pix != next_pix

    ih_i = is_head.astype(_I32)
    origin = (row8 == 0) & (lane == 0)
    first_head_i = jnp.max(jnp.where(origin, ih_i, 0))
    any_head_i = jnp.max(ih_i)

    # sticky overflow: a segment still open at entry whose earlier elements
    # span >= 2 full parts exceeds the one-part lookback (sentinel-tail
    # segments, pix == hw, never need the lookback: no winner is emitted)
    carry[16] = carry[16] | jnp.where(
        (first_head_i == 0) & (carry[15] >= 2) & (carry[4] < hw), 1, 0
    )

    # ---- head/end positions (in-row scans, v4 recipe) ----
    hp = jnp.where(is_head, lane, -1)
    s = 1
    while s < Lc:
        hp = jnp.maximum(hp, jnp.where(lane >= s, pltpu.roll(hp, s, axis=1), -1))
        s *= 2
    no_head = hp < 0
    dist = lane - jnp.maximum(hp, 0)

    BIGI = _I32(1 << 30)
    lp = jnp.where(is_last, lane, BIGI)
    s = 1
    while s < Lc:
        lp = jnp.minimum(
            lp, jnp.where(lane < Lc - s, pltpu.roll(lp, Lc - s, axis=1), BIGI)
        )
        s *= 2
    no_end = lp >= BIGI
    dist2 = lp - lane

    # ---- segmented min of depth over each pixel segment ----
    SENT = _I32(_SENT)
    m = zb
    s = 1
    while s < Lc:
        m = jnp.minimum(m, jnp.where(dist >= s, pltpu.roll(m, s, axis=1), SENT))
        s *= 2
    # cross-row forward ladder: min over preceding rows' open-suffix values
    # back to (and including) the nearest row with a head, else the carry
    A1 = last_col(m)
    sv = A1
    fv = (last_col(hp) >= 0).astype(_I32)
    k = 1
    while k < 8:
        sv_sh = jnp.concatenate([jnp.full((k, 1), SENT, _I32), sv[0 : 8 - k]], axis=0)
        fv_sh = jnp.concatenate([jnp.zeros((k, 1), _I32), fv[0 : 8 - k]], axis=0)
        sv = jnp.where(fv == 1, sv, jnp.minimum(sv, sv_sh))
        fv = fv | fv_sh
        k *= 2
    inc_v = jnp.concatenate([jnp.full((1, 1), SENT, _I32), sv[0:7]], axis=0)
    inc_f = jnp.concatenate([jnp.zeros((1, 1), _I32), fv[0:7]], axis=0)
    inc = jnp.where(inc_f == 1, inc_v, jnp.minimum(inc_v, carry[5]))
    m_fwd = jnp.where(no_head, jnp.minimum(m, inc), m)

    mb = zb
    s = 1
    while s < Lc:
        # lane < Lc - s: the leftward roll wraps for row-end lanes — without
        # the guard a no_end element pulls values from the row START
        mb = jnp.minimum(
            mb,
            jnp.where(
                (dist2 >= s) & (lane < Lc - s),
                pltpu.roll(mb, Lc - s, axis=1),
                SENT,
            ),
        )
        s *= 2
    # cross-row backward ladder: min over following rows' prefix values up
    # to (and including) the nearest row with a segment end; beyond the
    # part the value is stale by design (those elements' contributions are
    # excluded from the carry and re-reduced by the next part's lookback)
    A2 = mb[:, 0:1]
    sv2 = A2
    fv2 = (lp[:, 0:1] < BIGI).astype(_I32)
    k = 1
    while k < 8:
        sv_sh = jnp.concatenate([sv2[k:8], jnp.full((k, 1), SENT, _I32)], axis=0)
        fv_sh = jnp.concatenate([fv2[k:8], jnp.zeros((k, 1), _I32)], axis=0)
        sv2 = jnp.where(fv2 == 1, sv2, jnp.minimum(sv2, sv_sh))
        fv2 = fv2 | fv_sh
        k *= 2
    out_next = jnp.concatenate([sv2[1:8], jnp.full((1, 1), SENT, _I32)], axis=0)
    m_bwd = jnp.where(no_end, jnp.minimum(mb, out_next), mb)
    m_fin = jnp.minimum(m_fwd, m_bwd)

    # ---- one-part lookback: the boundary segment's previous-part
    # contributions, re-reduced under the now-final min ----
    zf = jax.lax.bitcast_convert_type(zb, jnp.float32)
    mf_f = jax.lax.bitcast_convert_type(m_fin, jnp.float32)
    mf00 = jnp.min(jnp.where(origin, mf_f, jnp.float32(jnp.inf)))
    gate_i = jnp.where((first_head_i == 0) & (p > 0), 1, 0)
    pix_prev = prev_v[0]
    zb_prev = prev_v[1]
    packed_prev = prev_v[2]
    zprev_f = jax.lax.bitcast_convert_type(zb_prev, jnp.float32)
    mask_prev = (
        (pix_prev == carry[4])
        & jnp.logical_not(zprev_f > mf00 + jnp.float32(depth_band))
        & (((packed_prev >> 24) & 1) == 1)
    )
    mp_i = mask_prev.astype(_I32) * gate_i
    ct = (
        jnp.sum((packed_prev & 255) * mp_i),
        jnp.sum(((packed_prev >> 8) & 255) * mp_i),
        jnp.sum(((packed_prev >> 16) & 255) * mp_i),
        jnp.sum(mp_i),
    )

    # ---- in-band contribution csum: MXU triangular block-scan (v4) ----
    in_band = ok & jnp.logical_not(zf > mf_f + jnp.float32(depth_band))
    w_i = real * in_band.astype(_I32)
    X = jnp.concatenate([r * w_i, g * w_i, b * w_i, w_i], axis=0)  # (32, Lc)
    TS = tri_v.shape[0]
    xb = X.astype(jnp.bfloat16)
    blocks = []
    carry32 = jnp.zeros((32, 1), jnp.float32)
    for jb in range(Lc // TS):
        blk = jax.lax.dot_general(
            xb[:, jb * TS : (jb + 1) * TS], tri_v[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + carry32
        blocks.append(blk)
        carry32 = pltpu.roll(blk, 1, axis=1)[:, 0:1]
    X_lane = jnp.concatenate(blocks, axis=1).astype(_I32)
    T = last_col(X_lane)
    row32 = jax.lax.broadcasted_iota(_I32, (32, 1), 0)
    g32 = row32 & 7
    acc = T
    s = 1
    while s < 8:
        sh = jnp.concatenate([jnp.zeros((s, 1), _I32), acc[0 : 32 - s]], axis=0)
        acc = acc + jnp.where(g32 >= s, sh, 0)
        s *= 2
    grp = row32 >> 3
    base4 = jnp.where(
        grp == 0,
        carry[6] + ct[0],
        jnp.where(
            grp == 1,
            carry[7] + ct[1],
            jnp.where(grp == 2, carry[8] + ct[2], carry[9] + ct[3]),
        ),
    )
    pre_row = (acc - T) + base4
    Xg = X_lane + pre_row

    # winner rows carry the INCLUSIVE global csums; the shared expansion
    # kernel diffs consecutive winner ranks (no prefix broadcast needed)
    SUM = Xg

    # ---- winner (segment end) + rank csum (v4) ----
    winner = is_last & ok
    wb = winner.astype(jnp.bfloat16)
    wblocks = []
    cw = jnp.zeros((8, 1), jnp.float32)
    for jb in range(Lc // TS):
        blk = jax.lax.dot_general(
            wb[:, jb * TS : (jb + 1) * TS], tri_v[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + cw
        wblocks.append(blk)
        cw = pltpu.roll(blk, 1, axis=1)[:, 0:1]
    Wl = jnp.concatenate(wblocks, axis=1).astype(_I32)
    Tw = last_col(Wl)
    row8c = jax.lax.broadcasted_iota(_I32, (8, 1), 0)
    accw = Tw
    s = 1
    while s < 8:
        sh = jnp.concatenate([jnp.zeros((s, 1), _I32), accw[0 : 8 - s]], axis=0)
        accw = accw + jnp.where(row8c >= s, sh, 0)
        s *= 2
    pre_w = (accw - Tw) + carry[14]
    Wg = Wl + pre_w
    Wexcl = Wg - winner.astype(_I32)

    # ---- placement by winner rank (factored one-hot, v4 recipe) ----
    o_part = carry[10]
    r_part = carry[12]
    slots_all = jnp.where(winner, Wexcl - o_part, _I32(-1))

    NQ = S // 128
    o_sub = _I32(0)
    for c in range(8):
        for j in range(Lc // S):
            sl = slice(j * S, (j + 1) * S)
            w_sub = winner[c : c + 1, sl]
            sl_sub = slots_all[c : c + 1, sl]
            k_c = jnp.sum(w_sub.astype(_I32))

            vals = (SUM[c : c + 1, sl], SUM[8 + c : 9 + c, sl],
                    SUM[16 + c : 17 + c, sl], SUM[24 + c : 25 + c, sl],
                    m_fin[c : c + 1, sl], pix[c : c + 1, sl])
            rows = []
            for v in vals:
                for shift in (0, 8, 16, 24):
                    rows.append(((v >> shift) & 255).astype(jnp.bfloat16))

            d_row = sl_sub - o_sub
            q_iota = jax.lax.broadcasted_iota(_I32, (NQ, S), 0)
            Q = ((d_row >> 7) == q_iota).astype(jnp.bfloat16)
            d_col = d_row.reshape(S, 1)
            R = (
                ((d_col & 127) == jax.lax.broadcasted_iota(_I32, (S, 128), 1))
                & (d_col >= 0)
            ).astype(jnp.bfloat16)
            B = jnp.concatenate([rb * Q for rb in rows], axis=0)  # (24*NQ, S)
            placed = jax.lax.dot_general(
                B, R,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            placed_i = placed.astype(_I32)
            out_rows = []
            for jj in range(6):
                vblk = (
                    placed_i[(4 * jj) * NQ : (4 * jj + 1) * NQ]
                    | (placed_i[(4 * jj + 1) * NQ : (4 * jj + 2) * NQ] << 8)
                    | (placed_i[(4 * jj + 2) * NQ : (4 * jj + 3) * NQ] << 16)
                    | (placed_i[(4 * jj + 3) * NQ : (4 * jj + 4) * NQ] << 24)
                )
                rq_i = jax.lax.broadcasted_iota(_I32, (NQ, 128), 0)
                out_rows.append(
                    jnp.concatenate(
                        [
                            jnp.sum(jnp.where(rq_i == q, vblk, 0), axis=0,
                                    keepdims=True)
                            for q in range(NQ)
                        ],
                        axis=1,
                    )
                    if NQ > 1
                    else vblk
                )
            out8 = jnp.concatenate(out_rows + [jnp.zeros((2, S), _I32)], axis=0)

            q = r_part + o_sub
            carry[11] = (q // 128) * 128
            q_al = pl.multiple_of(carry[11], 128)
            rq = q - q_al
            padded = jnp.concatenate([out8, jnp.zeros((8, 128), _I32)], axis=1)
            rolled = pltpu.roll(padded, rq, axis=1)
            lane_t = jax.lax.broadcasted_iota(_I32, (8, S + 128), 1)
            tmask = (lane_t >= rq) & (lane_t < rq + S)
            cur = part_out[:, pl.ds(q_al, S + 128)]
            part_out[:, pl.ds(q_al, S + 128)] = jnp.where(tmask, rolled, cur)
            o_sub = o_sub + k_c

    carry[11] = ((o_part - r_part) // 128) * 128
    o_al = pl.multiple_of(carry[11], 128)
    dma = pltpu.make_async_copy(
        part_out.at[:, pl.ds(0, L + 256)],
        wout_hbm.at[:, pl.ds(o_al, L + 256)],
        out_sem,
    )
    dma.start()

    end = r_part + o_sub
    carry[13] = (end // 128) * 128
    tail_al = pl.multiple_of(carry[13], 128)
    dma.wait()
    tail = part_out[:, pl.ds(tail_al, 128)]
    part_out[:, pl.ds(0, 128)] = tail
    r_next = end - tail_al

    # ---- carries ----
    last = Lc - 1
    il = is_last.astype(_I32)
    closed_i = il[7, last]
    carry[4] = pix[7, last]
    # pre-head base of the trailing open segment (its contributions are
    # excluded from the carry and re-reduced by the next part's lookback);
    # when the part's last element closed its segment, carry the full totals
    # csum base for the next part = csum at the LAST WINNER (== pre-head
    # base of the trailing open segment): subtract the open segment's
    # (stale-weighted) contributions — all elements with the trailing pixel
    # id, exactly as they entered Xg — unless the last element closed it
    lastpix = pix[7, last]
    open_m = (pix == lastpix).astype(_I32) * (1 - closed_i)
    carry[6] = Xg[7, last] - jnp.sum(X[0:8] * open_m)
    carry[7] = Xg[15, last] - jnp.sum(X[8:16] * open_m)
    carry[8] = Xg[23, last] - jnp.sum(X[16:24] * open_m)
    carry[9] = Xg[31, last] - jnp.sum(X[24:32] * open_m)
    carry[5] = jnp.where(closed_i == 1, SENT, m_fwd[7, last])
    carry[15] = jnp.where(any_head_i == 1, 1, carry[15] + 1)
    carry[10] = o_part + o_sub
    carry[12] = r_next
    carry[14] = Wg[7, last]

    # stash this part for the next part's lookback (the fetch slots can't
    # serve: the next part's prefetch overwrites the other slot in flight)
    prev_v[0] = pix
    prev_v[1] = zb
    prev_v[2] = packed

    @pl.when(p == n_parts - 1)
    def _():
        flag_v[:, :] = jnp.zeros((8, 128), _I32) + carry[16]
        fdma = pltpu.make_async_copy(flag_v, flag_hbm, tri_sem)
        fdma.start()
        fdma.wait()


def raster_images_pallas5(
    sp: SortedPoints,
    hw: int,
    depth_band: float,
    part_size: int = 16384,
    sub_chunk: int = 2048,
    expand_part: int = 16384,
    expand_sub: int = 1024,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dense (sums (HW,3) i32, count (HW,) i32, depth (HW,) f32) from a
    carrier-free, PIXEL-ONLY-sorted point stream (ops/raster.py
    ``project_and_sort(..., carriers=False, depth_key=False)``). Falls back
    (lax.cond, bit-exact) to a depth-keyed re-sort + the v4 kernels when a
    single pixel's segment exceeds the one-part lookback window."""
    from rtnr_tpu.ops.raster_pallas4 import expand_winners, raster_images_pallas4

    m = sp.pix.shape[0]
    L = part_size
    assert L % 8 == 0
    Lc = L // 8
    assert Lc % 128 == 0
    S = min(sub_chunk, Lc)
    assert Lc % S == 0 and S % 128 == 0
    PL = expand_part
    SE = expand_sub
    assert PL % SE == 0 and SE % 128 == 0 and PL <= L
    P = -(-m // L)
    pad = P * L + 8 * Lc - m

    z_bits = jax.lax.bitcast_convert_type(sp.z, jnp.int32)
    packed = (
        sp.rgb[:, 0]
        | (sp.rgb[:, 1] << 8)
        | (sp.rgb[:, 2] << 16)
        | jnp.where(sp.is_real, jnp.int32(1 << 24), 0)
    )

    def padit(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]).reshape(-1, Lc)

    pix_p = padit(sp.pix, jnp.int32(hw))
    zb_p = padit(z_bits, jax.lax.bitcast_convert_type(jnp.float32(jnp.inf), jnp.int32))
    packed_p = padit(packed, jnp.int32(0))

    TS = min(512, Lc)
    assert Lc % TS == 0
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (TS, TS), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (TS, TS), 1)
    ).astype(jnp.bfloat16)

    out_w = hw + L + 2048

    wimg, flagarr = pl.pallas_call(
        functools.partial(_winners_kernel5, Lc=Lc, S=S, hw=hw, depth_band=depth_band),
        out_shape=[
            jax.ShapeDtypeStruct((8, out_w), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ],
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2, 16, Lc), jnp.int32),
            pltpu.VMEM((2, 16, Lc), jnp.int32),
            pltpu.VMEM((2, 8, Lc), jnp.int32),
            pltpu.VMEM((TS, TS), jnp.bfloat16),
            pltpu.VMEM((3, 8, Lc), jnp.int32),
            pltpu.VMEM((8, L + 256), jnp.int32),
            pltpu.VMEM((8, 128), jnp.int32),
            pltpu.SMEM((18,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pix_p, zb_p, packed_p, tri)

    total = jnp.sum((sp.is_head & sp.ok).astype(jnp.int32))

    def fast(_):
        return expand_winners(wimg, total, hw, PL=PL, SE=SE, interpret=interpret)

    def slow(_):
        # exact fallback: re-sort WITH the depth key, run the v4 path
        pix2, zb2, packed2 = jax.lax.sort(
            (sp.pix, z_bits, packed), num_keys=2, is_stable=False
        )
        n = pix2.shape[0]
        idx = jnp.arange(n, dtype=jnp.int32)
        is_head2 = pix2 != jnp.concatenate([jnp.full((1,), -1, jnp.int32), pix2[:-1]])
        sp2 = SortedPoints(
            pix=pix2,
            z=jax.lax.bitcast_convert_type(zb2, jnp.float32),
            rgb=jnp.stack(
                [packed2 & 255, (packed2 >> 8) & 255, (packed2 >> 16) & 255], axis=1
            ),
            ok=pix2 < hw,
            is_real=(packed2 & (1 << 24)) != 0,
            is_head=is_head2,
            is_last=pix2 != jnp.concatenate([pix2[1:], jnp.full((1,), -2, jnp.int32)]),
            head_pos=jax.lax.cummax(jnp.where(is_head2, idx, jnp.int32(0))),
        )
        return raster_images_pallas4(
            sp2, hw, depth_band, part_size=part_size, sub_chunk=sub_chunk,
            expand_part=PL, expand_sub=SE, interpret=interpret,
        )

    return jax.lax.cond(flagarr[0, 0] == 0, fast, slow, 0)
