"""Pallas TPU resolve v4: carrier-free two-kernel raster resolve.

v1-v3 feed the resolve a point stream augmented with one carrier per output
pixel (ops/raster.py): carriers make per-pixel winners DENSE (the k-th
winner is pixel k), so a streaming kernel can place finished pixel rows at
output position == winner rank with bounded per-part windows. The price is
sorting H*W extra elements — measured 7.4 ms of the 21.1 ms sort at
5M points / 1080p (PROFILE_r02.md).

v4 drops the carriers and splits the resolve in two:

1. **Winner kernel** (same scans as v3 over the now points-only stream):
   instead of placing by pixel id, it compacts each winner's finished row
   (r, g, b, count, depth bits, pixel id) at output position == winner
   RANK — ranks are dense by construction, restoring the bounded-window
   invariant without carriers. One extra MXU block-scan computes the rank.

2. **Expansion kernel**: winners are <= 1 per pixel and pixel-sorted, so
   output part p (a PL-pixel range) consumes a bounded, contiguous window
   of the winner stream located by a host-side ``searchsorted`` at SE-pixel
   granularity (scalar-prefetched starts). Each SE-pixel output sub-chunk
   gathers its <= SE winners from a 128-aligned dynamic window slice and
   places them with the factored one-hot MXU matmul; untouched pixels keep
   the empty defaults (count 0, depth FLT_MAX — reference
   project_cloud.cu:316 seeding).

Bit-exact vs the carrier path (tests/test_raster_pallas4.py). Semantics
source: reference render.cu:53-163 (see ops/raster.py docstring).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtnr_tpu.ops.raster import SortedPoints

_REAL_BIT = 1 << 24
_I32 = jnp.int32
_FLT_MAX_BITS = 0x7F7FFFFF


def _place_rows(vals, d_row, NQ, int8: bool, nbytes=None):
    """Factored one-hot placement shared by the winners/expansion kernels.

    ``vals``: list of (1, W) i32 value rows; ``d_row``: (1, W) destination
    slot in [0, NQ*128) for placed elements, -1 otherwise (slots unique).
    Returns one (NQ>1: (1, NQ*128), else (NQ, 128)->(1,128)) i32 row per
    value with each element at its slot, 0 elsewhere.

    ``int8=True`` runs the one-hot matmul on the int8 MXU (2x bf16 peak on
    v5e): byte planes are stored offset by -128 so they fit int8, and an
    occupancy row (one-hot matmul of ones) restores the +128 exactly at
    placed slots — bit-identical results to the bf16 byte-plane path.

    ``nbytes`` (per value, default 4): byte planes carried for that value.
    Values whose top bytes are STRUCTURALLY zero (24-bit packed rgb, pixel
    ids below 2^24) skip those planes — the skipped planes reconstruct as
    zero, so results stay bit-identical while the plane build + matmul
    shrink.
    """
    W = d_row.shape[1]
    nv = len(vals)
    nbytes = list(nbytes) if nbytes is not None else [4] * nv
    assert len(nbytes) == nv and all(1 <= nb <= 4 for nb in nbytes)
    n_planes = sum(nbytes)
    q_iota = jax.lax.broadcasted_iota(_I32, (NQ, W), 0)
    hit = (d_row >> 7) == q_iota  # (NQ, W); rows select 128-blocks
    d_col = d_row.reshape(W, 1)
    # no d_col >= 0 term: invalid elements (-1 >> 7 == -1) miss every hit
    # row, so their value/occupancy contributions are zero regardless of
    # which Rm lane (-1 & 127 == 127) they select
    Rm = (d_col & 127) == jax.lax.broadcasted_iota(_I32, (W, 128), 1)
    if int8:
        blocks = []
        for v, nb in zip(vals, nbytes):
            for shift in (0, 8, 16, 24)[:nb]:
                b = ((v >> shift) & 255) - 128
                blocks.append(jnp.where(hit, b, 0).astype(jnp.int8))
        blocks.append(hit.astype(jnp.int8))  # occupancy
        B = jnp.concatenate(blocks, axis=0)  # ((n_planes+1)*NQ, W)
        placed = jax.lax.dot_general(
            B, Rm.astype(jnp.int8),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=_I32,
        )
        occ = placed[n_planes * NQ :]

        def plane(k):
            return placed[k * NQ : (k + 1) * NQ] + 128 * occ

    else:
        Q = hit.astype(jnp.bfloat16)
        rows = [
            ((v >> shift) & 255).astype(jnp.bfloat16)
            for v, nb in zip(vals, nbytes)
            for shift in (0, 8, 16, 24)[:nb]
        ]
        B = jnp.concatenate([rb * Q for rb in rows], axis=0)  # (n_planes*NQ, W)
        placed = jax.lax.dot_general(
            B, Rm.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(_I32)

        def plane(k):
            return placed[k * NQ : (k + 1) * NQ]

    out_rows = []
    rq_i = jax.lax.broadcasted_iota(_I32, (NQ, 128), 0)
    offs = [0]
    for nb in nbytes:
        offs.append(offs[-1] + nb)
    for jj in range(nv):
        vblk = plane(offs[jj])
        for i in range(1, nbytes[jj]):
            vblk = vblk | (plane(offs[jj] + i) << (8 * i))
        # row-q extraction as a masked sublane REDUCTION: lazy sublane
        # rolls keep a layout offset Mosaic's lane-concat rejects
        # ("offset mismatch on non-concat dimension")
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
    return out_rows


def _winners_kernel4(
    pix_hbm,  # (P*8+8, Lc) i32
    zb_hbm,
    packed_hbm,
    tri_hbm,  # (TS, TS) bf16 upper-triangular ones
    wout_hbm,  # (8, out_w) i32: rows r,g,b,count,zbits,pix,0,0 by winner rank
    pix_v,
    zb_v,
    packed_v,
    tri_v,
    part_out,
    carry,  # SMEM (18,)
    offs,  # SMEM (8 * Lc // S,) — per-sub-chunk placement offsets
    in_sem,
    tri_sem,
    out_sem,
    *,
    Lc: int,
    S: int,
    hw: int,
    depth_band: float,
    place_int8: bool = False,
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
        carry[5] = _FLT_MAX_BITS  # open z_head default
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

    # ---- head-depth broadcast (v3 recipe, zb row only) ----
    hp = jnp.where(is_head, lane, -1)
    s = 1
    while s < Lc:
        hp = jnp.maximum(hp, jnp.where(lane >= s, pltpu.roll(hp, s, axis=1), -1))
        s *= 2
    no_head = hp < 0
    dist = lane - jnp.maximum(hp, 0)

    H = zb  # (8, Lc)
    s = 1
    while s < Lc:
        H = jnp.where(dist < s, H, pltpu.roll(H, s, axis=1))
        s *= 2

    has_head_i = jnp.where(last_col(hp) >= 0, 1, 0)
    v_end = last_col(H)
    row8h = jax.lax.broadcasted_iota(_I32, (8, 1), 0)
    init8 = jnp.zeros((8, 1), _I32) + carry[5]
    out_v = jnp.where(has_head_i == 1, v_end, init8)
    fnd = has_head_i
    s = 1
    while s < 8:
        sh_v = jnp.concatenate([out_v[0:s], out_v[0 : 8 - s]], axis=0)
        sh_f = jnp.concatenate([jnp.zeros((s, 1), _I32), fnd[0 : 8 - s]], axis=0)
        take = (fnd == 0) & (sh_f == 1) & (row8h >= s)
        out_v = jnp.where(take, sh_v, out_v)
        fnd = jnp.where(take, 1, fnd)
        s *= 2
    inc_v = jnp.concatenate([init8[0:1], out_v[0:7]], axis=0)
    inc_f = jnp.concatenate([jnp.zeros((1, 1), _I32), fnd[0:7]], axis=0)
    inc = jnp.where((inc_f == 1) & (row8h >= 1), inc_v, init8)
    h_zb = jnp.where(no_head, inc, H)

    # ---- band + winner ----
    z = jax.lax.bitcast_convert_type(zb, jnp.float32)
    z_head = jax.lax.bitcast_convert_type(h_zb, jnp.float32)
    in_band = ok & jnp.logical_not(z > z_head + jnp.float32(depth_band))
    next_pix = jnp.where(
        lane == Lc - 1, pix16[1:9, 0:1], pltpu.roll(pix, Lc - 1, axis=1)
    )
    is_last = pix != next_pix
    # the winner row is the SEGMENT END, not the last in-band element:
    # out-of-band elements contribute zero to the csums, so the inclusive
    # csums at segment end equal those at the last in-band element, and
    # h_zb/pix are segment-wide — bit-identical winner values with one
    # fewer roll/compare chain (the next-z band test is gone)
    winner = ok & is_last

    # ---- IN-BAND-weighted contribution csum (MXU triangular block-scan).
    # Out-of-band elements contribute zero, so the winner rows can carry the
    # INCLUSIVE global csums: the expansion recovers each pixel's sums as
    # the difference between consecutive winner ranks, which removes the
    # 32-row pre-head prefix broadcast cascade entirely ----
    # the winner-rank csum rides the SAME block-scan as the contribution
    # csums (rows 32..39): one 40-row triangular MXU scan + one cascade
    # replaces two (the (8, Lc) rank scan's matmuls cost a full 128-row
    # MXU pass each — merged they are free)
    w_i = real * in_band.astype(_I32)
    X = jnp.concatenate(
        [r * w_i, g * w_i, b * w_i, w_i, winner.astype(_I32)], axis=0
    )  # (40, Lc)
    TS = tri_v.shape[0]
    xb = X.astype(jnp.bfloat16)
    # two-phase scan: all block dots issue first (independent — the MXU
    # streams them back-to-back instead of stalling on each block's carry
    # roll), then the carry chain runs on the tiny (40, 1) block totals
    # (bit-identical: f32 a+b == b+a, and each lane still receives the
    # same two-term sum dot + prefix)
    dots = [
        jax.lax.dot_general(
            xb[:, jb * TS : (jb + 1) * TS], tri_v[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        for jb in range(Lc // TS)
    ]
    totals = [pltpu.roll(d, 1, axis=1)[:, 0:1] for d in dots]
    blocks = []
    carry40 = jnp.zeros((40, 1), jnp.float32)
    for jb in range(Lc // TS):
        blocks.append(dots[jb] + carry40)
        carry40 = carry40 + totals[jb]
    Y_lane = jnp.concatenate(blocks, axis=1).astype(_I32)
    T = last_col(Y_lane)
    row40 = jax.lax.broadcasted_iota(_I32, (40, 1), 0)
    g40 = row40 & 7
    acc = T
    s = 1
    while s < 8:
        sh = jnp.concatenate([jnp.zeros((s, 1), _I32), acc[0 : 40 - s]], axis=0)
        acc = acc + jnp.where(g40 >= s, sh, 0)
        s *= 2
    grp = row40 >> 3
    base5 = jnp.where(
        grp == 0,
        carry[0],
        jnp.where(
            grp == 1,
            carry[1],
            jnp.where(grp == 2, carry[2],
                      jnp.where(grp == 3, carry[3], carry[14])),
        ),
    )
    pre_row = (acc - T) + base5
    Yg = Y_lane + pre_row
    Xg = Yg[0:32]
    SUM = Xg  # inclusive csums; the expansion diffs consecutive winners
    Wg = Yg[32:40]  # global inclusive winner csum
    Wexcl = Wg - winner.astype(_I32)

    # ---- placement by winner rank (factored one-hot, v3 recipe) ----
    o_part = carry[10]
    r_part = carry[12]
    slots_all = jnp.where(winner, Wexcl - o_part, _I32(-1))

    NQ = S // 128
    nj = Lc // S
    # every sub-chunk's placement offset is the rank csum at its first
    # element (Wexcl) — written to SMEM up-front as INDEPENDENT reductions,
    # so the placement loop below has no serial count -> offset dependency
    # between sub-chunks (the old o_sub accumulation interleaved a vector
    # reduce + SMEM round trip into every placement)
    for c in range(8):
        for j in range(nj):
            offs[c * nj + j] = jnp.sum(
                jnp.where(lane[c : c + 1, :] == j * S,
                          Wexcl[c : c + 1, :] - o_part, 0)
            )
    for c in range(8):
        for j in range(nj):
            sl = slice(j * S, (j + 1) * S)
            o_sub = offs[c * nj + j]
            sl_sub = slots_all[c : c + 1, sl]

            vals = (SUM[c : c + 1, sl], SUM[8 + c : 9 + c, sl],
                    SUM[16 + c : 17 + c, sl], SUM[24 + c : 25 + c, sl],
                    h_zb[c : c + 1, sl], pix[c : c + 1, sl])
            d_row = sl_sub - o_sub  # winners: in [0, k_c)
            # placed pix values are winner pixels < hw: drop structurally-
            # zero top byte planes (bit-identical, less plane work)
            pix_nb = 1 + max(0, (hw - 1).bit_length() - 1) // 8
            out_rows = _place_rows(list(vals), d_row, NQ, place_int8,
                                   nbytes=[4, 4, 4, 4, 4, pix_nb])
            out8 = jnp.concatenate(out_rows + [jnp.zeros((2, S), _I32)], axis=0)

            q = r_part + o_sub
            q_al = pl.multiple_of(((q // 128) * 128), 128)
            rq = q - q_al
            padded = jnp.concatenate([out8, jnp.zeros((8, 128), _I32)], axis=1)
            rolled = pltpu.roll(padded, rq, axis=1)
            lane_t = jax.lax.broadcasted_iota(_I32, (8, S + 128), 1)
            tmask = (lane_t >= rq) & (lane_t < rq + S)
            cur = part_out[slot, :, pl.ds(q_al, S + 128)]
            part_out[slot, :, pl.ds(q_al, S + 128)] = jnp.where(tmask, rolled, cur)
    o_sub = Wg[7, Lc - 1] - o_part  # winners in this part

    # double-buffered output stores: this part's DMA drains while the next
    # part computes; the previous part's DMA (a full part of compute old)
    # is waited here, after which its slot's leading block can take the tail
    carry[11] = ((o_part - r_part) // 128) * 128
    o_al = pl.multiple_of(carry[11], 128)
    pltpu.make_async_copy(
        part_out.at[slot, :, pl.ds(0, L + 256)],
        wout_hbm.at[:, pl.ds(o_al, L + 256)],
        out_sem.at[slot],
    ).start()

    def wait_outdma(s):
        pltpu.make_async_copy(
            part_out.at[s, :, pl.ds(0, L + 256)],
            wout_hbm.at[:, pl.ds(0, L + 256)],
            out_sem.at[s],
        ).wait()

    @pl.when(p >= 1)
    def _():
        wait_outdma(1 - slot)

    end = r_part + o_sub
    carry[13] = (end // 128) * 128
    tail_al = pl.multiple_of(carry[13], 128)
    tail = part_out[slot, :, pl.ds(tail_al, 128)]
    part_out[1 - slot, :, pl.ds(0, 128)] = tail
    r_next = end - tail_al

    @pl.when(p == n_parts - 1)
    def _():
        wait_outdma(slot)

    last = Lc - 1
    carry[0] = Xg[7, last]
    carry[1] = Xg[15, last]
    carry[2] = Xg[23, last]
    carry[3] = Xg[31, last]
    carry[4] = pix[7, last]
    carry[5] = h_zb[7, last]
    carry[10] = o_part + o_sub
    carry[12] = r_next
    carry[14] = Wg[7, last]


def _expand_kernel4(
    starts_ref,  # SMEM (PB,) i32 — winner index of each part's first pixel
    total_ref,  # SMEM (1,) i32 — number of winners
    wimg_hbm,  # (8, out_w) i32 winner stream
    out_hbm,  # (8, PB*PL) i32 dense image
    win_v,  # VMEM (8, PL + SE + 384)
    rows_v,  # VMEM (8, PL + SE + 384) — extracted + rank-diffed rows
    out_v,  # VMEM (8, PL)
    smem,  # SMEM (2,)
    in_sem,
    out_sem,
    *,
    PL: int,
    SE: int,
    hw: int,
    packed_out: bool = False,
    place_int8: bool = False,
    float_sums: bool = False,  # csum rows 0-3 are f32 bit patterns
):
    p = pl.program_id(0)
    PB = pl.num_programs(0)
    n_sub = PL // SE
    W_WIN = PL + SE + 384
    slot = jax.lax.rem(p, 2)

    # double-buffered window fetch; the aligned start rides SMEM per slot.
    # The window fetches one extra 128-lane block in FRONT: winner rows
    # carry INCLUSIVE csums, and each pixel's sums are the diff against the
    # previous rank.
    def start_fetch(pp, s):
        smem[s] = jnp.maximum((starts_ref[pp] // 128) * 128 - 128, 0)
        sa = pl.multiple_of(smem[s], 128)
        pltpu.make_async_copy(
            wimg_hbm.at[:, pl.ds(sa, W_WIN)], win_v.at[s], in_sem.at[s]
        ).start()

    @pl.when(p == 0)
    def _():
        start_fetch(0, 0)

    @pl.when(p + 1 < PB)
    def _():
        start_fetch(p + 1, 1 - slot)

    total = total_ref[0]
    pltpu.make_async_copy(
        wimg_hbm.at[:, pl.ds(0, W_WIN)], win_v.at[slot], in_sem.at[slot]
    ).wait()
    s_al = pl.multiple_of(smem[slot], 128)

    # extract all six winner rows ONCE over the whole window (masked
    # reductions: lazy sublane rolls keep a layout offset that breaks later
    # lane-concats), diff the csum rows 0-3 against the previous rank
    # (global rank 0 diffs against zero), and stage into rows_v so the
    # sub-chunk loop can slice a ref at dynamic 128-aligned offsets.
    row8w = jax.lax.broadcasted_iota(_I32, (8, W_WIN), 0)
    gidx_w = s_al + jax.lax.broadcasted_iota(_I32, (1, W_WIN), 1)
    vr = [
        jnp.sum(jnp.where(row8w == k, win_v[slot], 0), axis=0, keepdims=True)
        for k in range(6)
    ]
    wpix_clean = jnp.where(gidx_w < total, vr[5], _I32(hw))
    dsums = []
    for k in range(4):
        prev = pltpu.roll(vr[k], 1, axis=1)
        if float_sums:
            # the differentiable forward's csums are f32: diff in float
            # and carry the bit pattern (byte-plane placement is exact for
            # any 32-bit pattern)
            d = pltpu.bitcast(vr[k], jnp.float32) - jnp.where(
                gidx_w == 0, jnp.float32(0.0),
                pltpu.bitcast(prev, jnp.float32),
            )
            d = pltpu.bitcast(d, jnp.int32)
        else:
            d = vr[k] - jnp.where(gidx_w == 0, 0, prev)
        dsums.append(d)
    if packed_out:
        # resolve BEFORE placement: integer-average per WINNER (reference
        # render.cu:160-162) in the window stage, so only TWO values place
        # per sub-chunk (pk + depth) instead of five. Empty pixels read the
        # placement's zeros: pk 0 = black, and depth places zb ^ FLT_MAX so
        # the xor-back turns unplaced zeros into the FLT_MAX seed
        # (project_cloud.cu:316).
        cnt = dsums[3]
        cpos = jnp.maximum(cnt, 1)
        pk = jnp.where(
            cnt > 0,
            (dsums[0] // cpos)
            | ((dsums[1] // cpos) << 8)
            | ((dsums[2] // cpos) << 16),
            0,
        )
        rows_v[0:1, :] = pk
        rows_v[1:2, :] = vr[4] ^ _I32(_FLT_MAX_BITS)
    else:
        for k in range(4):
            rows_v[k : k + 1, :] = dsums[k]
        rows_v[4:5, :] = vr[4]
    rows_v[5:6, :] = wpix_clean

    NQ = SE // 128
    SW = SE + 128
    for j in range(n_sub):
        base = p * PL + j * SE
        # NOTE (r5): three attempts to replace this per-sub-chunk count
        # scan with SE-granularity searchsorted offsets (prefetch-read
        # arithmetic, SMEM-routed arithmetic, fully-precomputed prefetch
        # values) ALL faulted the TPU worker at the 5M/1080p shape in the
        # 5-value expansion — with values verified identical, in-bounds,
        # and a verified-monotone winner stream. Mosaic scalar handling;
        # the in-kernel reduce stays.
        cnt = jnp.sum((wpix_clean < base).astype(_I32))
        smem[2] = (cnt // 128) * 128
        lo_al = pl.multiple_of(smem[2], 128)
        vrows = [rows_v[k : k + 1, pl.ds(lo_al, SW)] for k in range(6)]
        wpix = vrows[5]
        gidx = s_al + lo_al + jax.lax.broadcasted_iota(_I32, (1, SW), 1)
        valid = (wpix >= base) & (wpix < base + SE) & (wpix < hw) & (gidx < total)
        d_row = jnp.where(valid, wpix - base, _I32(-1))  # (1, SW)
        if packed_out:
            # pk is r|g<<8|b<<16 of 8-bit channel averages: top byte is
            # structurally zero — 3 planes, bit-identical
            out_rows = _place_rows(list(vrows[:2]), d_row, NQ, place_int8,
                                   nbytes=[3, 4])
            depth = out_rows[1] ^ _I32(_FLT_MAX_BITS)
            out8 = jnp.concatenate(
                [out_rows[0], depth, jnp.zeros((6, SE), _I32)], axis=0
            )
        else:
            out_rows = _place_rows(list(vrows[:5]), d_row, NQ, place_int8)
            # empty pixels: count==0 -> depth = FLT_MAX bits (reference
            # seed, project_cloud.cu:316); color sums stay 0. count>0 is
            # exact for i32 counts; for float_sums the count row is a
            # non-negative f32 whose bit pattern is > 0 iff value > 0.
            depth = jnp.where(out_rows[3] > 0, out_rows[4],
                              _I32(_FLT_MAX_BITS))
            out8 = jnp.concatenate(
                out_rows[:4] + [depth, jnp.zeros((3, SE), _I32)], axis=0
            )
        out_v[slot, :, j * SE : (j + 1) * SE] = out8

    # double-buffered store: drains during the next part's compute
    pltpu.make_async_copy(
        out_v.at[slot], out_hbm.at[:, pl.ds(p * PL, PL)], out_sem.at[slot]
    ).start()

    def wait_out(s):
        pltpu.make_async_copy(
            out_v.at[s], out_hbm.at[:, pl.ds(0, PL)], out_sem.at[s]
        ).wait()

    @pl.when(p >= 1)
    def _():
        wait_out(1 - slot)

    @pl.when(p == PB - 1)
    def _():
        wait_out(slot)


def raster_images_pallas4(
    sp: SortedPoints,
    hw: int,
    depth_band: float,
    part_size: int = None,  # r4 sweep: 32768 (7.35 vs 7.66 ms at 16384)
    sub_chunk: int = 2048,  # v5e sweep (scripts/profile_resolve4.py)
    expand_part: int = None,  # 32768 exceeds scoped VMEM in-pipeline
    expand_sub: int = 4096,  # r5 sweep: 6.84 ms vs 7.4-7.5 at SE<=2048
    packed_out: bool = False,
    interpret: bool = False,
    place_int8: bool = None,
):
    """Dense (sums (HW,3) i32, count (HW,) i32, depth (HW,) f32) from a
    CARRIER-FREE (pixel, depth)-sorted point stream (ops/raster.py
    ``project_and_sort(..., carriers=False)``). With ``packed_out`` the
    integer-average resolve runs inside the expansion kernel and the return
    is (packed rgb r|g<<8|b<<16 (HW,) i32, depth (HW,) f32)."""
    if place_int8 is None:
        place_int8 = os.environ.get("RTNR_PLACE_INT8", "1") == "1"
    if expand_part is None:
        expand_part = int(os.environ.get("RTNR_EXPAND_PART", 16384))
    if part_size is None:
        part_size = int(os.environ.get("RTNR_WINNERS_PART", 32768))
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
        | jnp.where(sp.is_real, jnp.int32(_REAL_BIT), 0)
    )

    def padit(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]).reshape(-1, Lc)

    pix_p = padit(sp.pix, jnp.int32(hw))
    zb_p = padit(z_bits, jax.lax.bitcast_convert_type(jnp.float32(jnp.inf), jnp.int32))
    packed_p = padit(packed, jnp.int32(0))

    # the (TS, TS) triangular scan operand counts twice against scoped
    # VMEM (buffer + loaded value); at L=65536 the 512-tile overflows the
    # 16 MB limit by ~0.6 MB — halve it there (more scan blocks, same MXU
    # work)
    TS = min(512 if L <= 32768 else 256, Lc)
    assert Lc % TS == 0
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (TS, TS), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (TS, TS), 1)
    ).astype(jnp.bfloat16)

    out_w = hw + L + 2048

    wimg = pl.pallas_call(
        functools.partial(_winners_kernel4, Lc=Lc, S=S, hw=hw,
                          depth_band=depth_band, place_int8=place_int8),
        out_shape=jax.ShapeDtypeStruct((8, out_w), jnp.int32),
        grid=(P,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 16, Lc), jnp.int32),
            pltpu.VMEM((2, 16, Lc), jnp.int32),
            pltpu.VMEM((2, 8, Lc), jnp.int32),
            pltpu.VMEM((TS, TS), jnp.bfloat16),
            pltpu.VMEM((2, 8, L + 256), jnp.int32),
            pltpu.SMEM((18,), jnp.int32),
            pltpu.SMEM((8 * (Lc // S),), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pix_p, zb_p, packed_p, tri)

    # winner count + per-part window starts for the expansion (sub-chunk
    # starts are found in-kernel; only PB scalars ride SMEM prefetch)
    total = jnp.sum((sp.is_head & sp.ok).astype(jnp.int32))
    return expand_winners(wimg, total, hw, PL=PL, SE=SE,
                          packed_out=packed_out, interpret=interpret,
                          place_int8=place_int8)


def _compact_kernel(
    starts_ref,  # SMEM prefetch (P+1,) i32 — exclusive winner rank at part starts
    *refs,
    Lc: int,
    S: int,
    place_int8: bool = False,
):
    """Compact rows with a dense rank to output position == rank.

    Inputs: ``slot`` (8, Lc) per part — the element's global output rank
    for selected elements, -1 otherwise (ranks strictly increasing along
    the stream); six 32-bit value lanes. The XLA side computes
    winner flags/ranks/csums; this kernel only does the bounded-window
    placement the winners kernel pioneered (same aligned-store + tail
    carry pattern), so the differentiable forward can skip the full-stream
    placement SORT."""
    it = iter(refs)
    slot_hbm = next(it)
    v_hbm = [next(it) for _ in range(6)]
    wout_hbm = next(it)
    slot_v = next(it)
    v_v = [next(it) for _ in range(6)]
    part_out = next(it)
    in_sem = next(it)
    out_sem = next(it)

    p = pl.program_id(0)
    n_parts = pl.num_programs(0)
    even = jax.lax.rem(p, 2) == 0
    L = 8 * Lc

    def start_fetch(part, sl):
        pltpu.make_async_copy(
            slot_hbm.at[pl.ds(part * 8, 8), :], slot_v.at[sl], in_sem.at[sl, 0]
        ).start()
        for i in range(6):
            pltpu.make_async_copy(
                v_hbm[i].at[pl.ds(part * 8, 8), :], v_v[i].at[sl],
                in_sem.at[sl, i + 1],
            ).start()

    def wait_fetch(sl):
        pltpu.make_async_copy(
            slot_hbm.at[pl.ds(0, 8), :], slot_v.at[sl], in_sem.at[sl, 0]
        ).wait()
        for i in range(6):
            pltpu.make_async_copy(
                v_hbm[i].at[pl.ds(0, 8), :], v_v[i].at[sl], in_sem.at[sl, i + 1]
            ).wait()

    @pl.when(p == 0)
    def _():
        start_fetch(0, 0)

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

    sl = jax.lax.rem(p, 2)
    o_part = starts_ref[p]
    o_al_s = (o_part // 128) * 128
    r_part = o_part - o_al_s

    slots = slot_v[sl]
    NQ = S // 128
    o_sub = _I32(0)
    for c in range(8):
        for j in range(Lc // S):
            ssl = slice(j * S, (j + 1) * S)
            sl_sub = slots[c : c + 1, ssl]
            sel = sl_sub >= 0
            k_c = jnp.sum(sel.astype(_I32))
            d_row = jnp.where(sel, sl_sub - o_part, _I32(-1)) - o_sub
            d_row = jnp.where(sel, d_row, _I32(-1))
            vals = [v_v[i][sl][c : c + 1, ssl] for i in range(6)]
            out_rows = _place_rows(vals, d_row, NQ, place_int8)
            out8 = jnp.concatenate(out_rows + [jnp.zeros((2, S), _I32)], axis=0)

            q = r_part + o_sub
            q_al = pl.multiple_of((q // 128) * 128, 128)
            rq = q - q_al
            padded = jnp.concatenate([out8, jnp.zeros((8, 128), _I32)], axis=1)
            rolled = pltpu.roll(padded, rq, axis=1)
            lane_t = jax.lax.broadcasted_iota(_I32, (8, S + 128), 1)
            tmask = (lane_t >= rq) & (lane_t < rq + S)
            cur = part_out[sl, :, pl.ds(q_al, S + 128)]
            part_out[sl, :, pl.ds(q_al, S + 128)] = jnp.where(tmask, rolled, cur)
            o_sub = o_sub + k_c

    pltpu.make_async_copy(
        part_out.at[sl, :, pl.ds(0, L + 256)],
        wout_hbm.at[:, pl.ds(o_al_s, L + 256)],
        out_sem.at[sl],
    ).start()

    def wait_outdma(sx):
        pltpu.make_async_copy(
            part_out.at[sx, :, pl.ds(0, L + 256)],
            wout_hbm.at[:, pl.ds(0, L + 256)],
            out_sem.at[sx],
        ).wait()

    @pl.when(p >= 1)
    def _():
        wait_outdma(1 - sl)

    # carry the unaligned tail block into the next part's staging slot
    end = r_part + o_sub
    tail_al = pl.multiple_of((end // 128) * 128, 128)
    tail = part_out[sl, :, pl.ds(tail_al, 128)]
    part_out[1 - sl, :, pl.ds(0, 128)] = tail

    @pl.when(p == n_parts - 1)
    def _():
        wait_outdma(sl)


def compact_rows_by_rank(
    slot: jax.Array,
    vals,
    total: jax.Array,
    *,
    part_size: int = 16384,
    sub_chunk: int = 2048,
    out_w: int = None,
    place_int8: bool = None,
    interpret: bool = False,
    part_starts: jax.Array = None,  # (P,) exclusive rank at part starts
) -> jax.Array:
    """(m,) streams -> (8, out_w) winner image: element i with slot[i] >= 0
    lands at lanes slot[i] (rows = the six 32-bit ``vals`` lanes); slots
    must be strictly increasing along the stream (a rank). Feeds
    ``expand_winners``."""
    if place_int8 is None:
        place_int8 = os.environ.get("RTNR_PLACE_INT8", "1") == "1"
    m = slot.shape[0]
    L = part_size
    Lc = L // 8
    S = min(sub_chunk, Lc)
    assert Lc % S == 0 and S % 128 == 0
    P = -(-m // L)
    pad = P * L - m
    assert len(vals) == 6

    def padit(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]
        ).reshape(-1, Lc)

    slot_p = padit(slot.astype(jnp.int32), jnp.int32(-1))
    vals_p = [padit(v, jnp.int32(0)) for v in vals]
    if out_w is None:
        out_w = m + L + 2048
    if part_starts is None:
        # exclusive rank at each part start from a cummax of slots (the
        # caller usually has the exclusive-rank array and passes
        # part_starts = rank_excl[::part_size] to skip this)
        incl = jax.lax.cummax(jnp.where(slot >= 0, slot, -1))
        idx = jnp.arange(P, dtype=jnp.int32) * jnp.int32(L)
        part_starts = jnp.where(
            idx > 0, jnp.take(incl, jnp.maximum(idx - 1, 0)) + 1, 0
        )
    starts = jnp.concatenate(
        [part_starts.astype(jnp.int32), total.reshape(1).astype(jnp.int32)]
    )

    wimg = pl.pallas_call(
        functools.partial(_compact_kernel, Lc=Lc, S=S, place_int8=place_int8),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 8, Lc), jnp.int32),
            ] + [pltpu.VMEM((2, 8, Lc), jnp.int32) for _ in range(6)] + [
                pltpu.VMEM((2, 8, L + 256), jnp.int32),
                pltpu.SemaphoreType.DMA((2, 7)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, out_w), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, slot_p, *vals_p)
    return wimg


def expand_winners(
    wimg: jax.Array,
    total: jax.Array,
    hw: int,
    *,
    PL: int = 16384,
    SE: int = 1024,
    packed_out: bool = False,
    interpret: bool = False,
    place_int8: bool = None,
    float_sums: bool = False,
):
    """Expansion stage shared by the v4/v5 winner kernels: scatter the
    compacted, pixel-sorted winner stream ``wimg`` (8, out_w) — rows
    r,g,b,count,zbits,pix by winner rank, ``total`` winners — to the dense
    (sums (HW,3) i32, count (HW,) i32, depth (HW,) f32) images."""
    if place_int8 is None:
        place_int8 = os.environ.get("RTNR_PLACE_INT8", "1") == "1"
    out_w = wimg.shape[1]
    PB = -(-hw // PL)
    n_sub = PL // SE
    lanes = jnp.arange(out_w, dtype=jnp.int32)
    wpix_clean = jnp.where(lanes < total, wimg[5], jnp.int32(hw))
    targets = jnp.arange(PB, dtype=jnp.int32) * jnp.int32(PL)
    starts = jnp.searchsorted(wpix_clean, targets, side="left").astype(jnp.int32)

    img = pl.pallas_call(
        functools.partial(_expand_kernel4, PL=PL, SE=SE, hw=hw,
                          packed_out=packed_out, place_int8=place_int8,
                          float_sums=float_sums),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(PB,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, 8, PL + SE + 384), jnp.int32),
                pltpu.VMEM((8, PL + SE + 384), jnp.int32),
                pltpu.VMEM((2, 8, PL), jnp.int32),
                pltpu.SMEM((3,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8, PB * PL), jnp.int32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, total.reshape(1), wimg)

    img = img[:, :hw]
    if packed_out:
        assert not float_sums
        packed = img[0]
        depth = jax.lax.bitcast_convert_type(img[1], jnp.float32)
        return packed, depth
    if float_sums:
        f = lambda r: jax.lax.bitcast_convert_type(r, jnp.float32)
        sums = jnp.stack([f(img[0]), f(img[1]), f(img[2])], axis=1)
        count = f(img[3])
    else:
        sums = jnp.stack([img[0], img[1], img[2]], axis=1)
        count = img[3]
    depth = jax.lax.bitcast_convert_type(img[4], jnp.float32)
    return sums, count, depth
