"""Pallas TPU kernel v3: fused raster resolve, double-buffered + MXU scans.

Same contract and bit-exact output as ``raster_pallas2.raster_images_pallas2``
(one streaming pass over the (pixel, depth)-sorted point+carrier stream ->
dense per-pixel color sums / counts / min-depth). Two changes aimed at the
v2 kernel's measured cost (~14 ms at 7.07M elements, ~60x off memory
speed-of-light):

1. **Double-buffered input DMAs**: v2 starts each part's three HBM->VMEM
   copies at the top of the part and immediately waits — every part eats
   the full DMA latency serially. v3 prefetches part p+1 while computing
   part p (classic two-slot scheme; the TPU grid is sequential so SMEM
   carries still work).

2. **MXU cumulative sums**: v2's four-channel contribution cumsum is a
   Hillis-Steele lane-doubling scan — log2(Lc) VPU roll+select passes over
   a (32, Lc) block. v3 computes the same inclusive prefix sums as ONE
   matmul against a constant upper-triangular ones matrix:
   ``csum = X @ U`` with U[j, i] = 1 iff j <= i. Exactness: every operand
   is an integer <= 255 (exact in bf16) and every prefix sum is
   < 16384 * 255 < 2^24 (exact in the f32 accumulator), so the int32
   results are bit-identical to the integer scan.

The head-broadcast (segment-select doubling) and the one-hot placement are
inherited from v2 unchanged. Semantics source: reference render.cu:53-163
(see ops/raster.py docstring).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtnr_tpu.ops.raster import SortedPoints

_REAL_BIT = 1 << 24
_I32 = jnp.int32


def _resolve_kernel3(
    pix_hbm,  # (P*8+8, Lc) i32
    zb_hbm,  # (P*8+8, Lc) i32
    packed_hbm,  # (P*8+8, Lc) i32
    tri_hbm,  # (Lc, Lc) bf16 upper-triangular ones (constant)
    img_hbm,  # (8, out_w) i32
    pix_v,  # VMEM (2, 16, Lc) double-buffered
    zb_v,  # VMEM (2, 16, Lc)
    packed_v,  # VMEM (2, 8, Lc)
    tri_v,  # VMEM (Lc, Lc) bf16
    part_out,  # VMEM (8, L + 256)
    carry,  # SMEM (16,)
    in_sem,  # DMA sems (2, 3)
    tri_sem,
    out_sem,
    *,
    Lc: int,
    S: int,
    hw: int,
    depth_band: float,
    skip_placement: bool = False,
    skip_scans: bool = False,
    factored: bool = True,
):
    L = 8 * Lc
    p = pl.program_id(0)
    n_parts = pl.num_programs(0)
    even = jax.lax.rem(p, 2) == 0

    def start_fetch(part, s):
        # s is a PYTHON int (static): Mosaic can't index DMA semaphores
        # dynamically, so callers branch on parity with pl.when
        cp = pltpu.make_async_copy(
            pix_hbm.at[pl.ds(part * 8, 16), :], pix_v.at[s], in_sem.at[s, 0]
        )
        cz = pltpu.make_async_copy(
            zb_hbm.at[pl.ds(part * 8, 16), :], zb_v.at[s], in_sem.at[s, 1]
        )
        ck = pltpu.make_async_copy(
            packed_hbm.at[pl.ds(part * 8, 8), :], packed_v.at[s], in_sem.at[s, 2]
        )
        cp.start()
        cz.start()
        ck.start()

    def wait_fetch(s):
        pltpu.make_async_copy(pix_hbm.at[pl.ds(0, 16), :], pix_v.at[s], in_sem.at[s, 0]).wait()
        pltpu.make_async_copy(zb_hbm.at[pl.ds(0, 16), :], zb_v.at[s], in_sem.at[s, 1]).wait()
        pltpu.make_async_copy(packed_hbm.at[pl.ds(0, 8), :], packed_v.at[s], in_sem.at[s, 2]).wait()

    @pl.when(p == 0)
    def _():
        for i in range(14):
            carry[i] = 0
        carry[4] = -1  # open pix: nothing open
        carry[5] = 0x7F7FFFFF  # FLT_MAX bits: open z_head default
        start_fetch(0, 0)
        pltpu.make_async_copy(tri_hbm, tri_v, tri_sem).start()
        pltpu.make_async_copy(tri_hbm, tri_v, tri_sem).wait()

    # prefetch the next part (opposite slot) while this one computes
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

    # reading the current slot by traced index is a plain VMEM dynamic
    # slice on the leading dim (supported), unlike semaphore indexing
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

    # ---- segment heads (predecessor pixel; row 0 lane 0 <- open pixel) ----
    def last_col(x):
        return pltpu.roll(x, 1, axis=1)[:, 0:1]

    pix_rolled = pltpu.roll(pix, 1, axis=1)
    prev_last = jnp.concatenate(
        [jnp.full((1, 1), carry[4], _I32), pix_rolled[0:7, 0:1]], axis=0
    )
    prev_pix = jnp.where(lane == 0, prev_last, pix_rolled)
    is_head = pix != prev_pix

    # ---- contribution cumsum: MXU matmuls against triangular ones, in
    # TS-lane blocks with a running per-row carry (keeps the constant
    # triangular matrix at (TS, TS) so VMEM stays within budget) ----
    X = jnp.concatenate([r * real, g * real, b * real, real], axis=0)  # (32, Lc)
    TS = tri_v.shape[0]
    xb = X.astype(jnp.bfloat16)
    blocks = []
    carry32 = jnp.zeros((32, 1), jnp.float32)
    for jb in range(Lc // TS):
        blk = jax.lax.dot_general(
            xb[:, jb * TS : (jb + 1) * TS],
            tri_v[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + carry32
        blocks.append(blk)
        # last lane via roll (a direct [:, -1:] slice leaves a lane-offset
        # layout Mosaic can't combine with offset-0 operands)
        carry32 = pltpu.roll(blk, 1, axis=1)[:, 0:1]
    X_lane = jnp.concatenate(blocks, axis=1).astype(_I32)  # (32, Lc), exact
    # cross-row stitch: exclusive prefix of row totals within each 8-row group
    T = last_col(X_lane)  # (32, 1) inclusive row totals
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
        carry[0],
        jnp.where(grp == 1, carry[1], jnp.where(grp == 2, carry[2], carry[3])),
    )
    pre_row = (acc - T) + base4  # csum just before each row starts (32, 1)
    Xg = X_lane + pre_row  # global inclusive csum (32, Lc)
    lane32 = jax.lax.broadcasted_iota(_I32, (32, Lc), 1)
    PR = jnp.where(lane32 == 0, pre_row, pltpu.roll(Xg, 1, axis=1))  # prev csum

    # ---- head broadcast: [PR(32 rows), zb(8 rows)] -> (40, Lc) ----
    hp = jnp.where(is_head, lane, -1)
    if not skip_scans:
        s = 1
        while s < Lc:
            hp = jnp.maximum(hp, jnp.where(lane >= s, pltpu.roll(hp, s, axis=1), -1))
            s *= 2
    no_head = hp < 0
    dist = lane - jnp.maximum(hp, 0)

    H = jnp.concatenate([PR, zb], axis=0)  # (40, Lc)
    dist40 = jnp.concatenate([dist] * 5, axis=0)
    if not skip_scans:
        s = 1
        while s < Lc:
            H = jnp.where(dist40 < s, H, pltpu.roll(H, s, axis=1))
            s *= 2

    # rows whose prefix has no local head take the open segment's value:
    # resolved from earlier rows in the part, else the SMEM carries.
    has_head_i = jnp.where(last_col(hp) >= 0, 1, 0)  # (8, 1) i32
    hh40 = jnp.concatenate([has_head_i] * 5, axis=0)  # (40, 1)
    v_end = last_col(H)  # (40, 1)
    row40 = jax.lax.broadcasted_iota(_I32, (40, 1), 0)
    g40 = row40 & 7
    grp40 = row40 >> 3
    init40 = jnp.where(
        grp40 == 0,
        carry[6],
        jnp.where(
            grp40 == 1,
            carry[7],
            jnp.where(grp40 == 2, carry[8], jnp.where(grp40 == 3, carry[9], carry[5])),
        ),
    )
    out_v = jnp.where(hh40 == 1, v_end, init40)
    fnd = hh40
    s = 1
    while s < 8:
        sh_v = jnp.concatenate([out_v[0:s], out_v[0 : 40 - s]], axis=0)
        sh_f = jnp.concatenate([jnp.zeros((s, 1), _I32), fnd[0 : 40 - s]], axis=0)
        take = (fnd == 0) & (sh_f == 1) & (g40 >= s)
        out_v = jnp.where(take, sh_v, out_v)
        fnd = jnp.where(take, 1, fnd)
        s *= 2
    inc_v = jnp.concatenate([init40[0:1], out_v[0:39]], axis=0)
    inc_f = jnp.concatenate([jnp.zeros((1, 1), _I32), fnd[0:39]], axis=0)
    inc = jnp.where((inc_f == 1) & (g40 >= 1), inc_v, init40)  # (40, 1)
    nh40 = jnp.concatenate([no_head] * 5, axis=0)
    H = jnp.where(nh40, inc, H)

    h_PR = H[0:32, :]
    h_zb = H[32:40, :]

    # ---- band + winner (successor-based; halo row supplies the last one) ----
    z = jax.lax.bitcast_convert_type(zb, jnp.float32)
    z_head = jax.lax.bitcast_convert_type(h_zb, jnp.float32)
    in_band = ok & jnp.logical_not(z > z_head + jnp.float32(depth_band))
    next_pix = jnp.where(
        lane == Lc - 1, pix16[1:9, 0:1], pltpu.roll(pix, Lc - 1, axis=1)
    )
    next_zb = jnp.where(lane == Lc - 1, zb16[1:9, 0:1], pltpu.roll(zb, Lc - 1, axis=1))
    next_z = jax.lax.bitcast_convert_type(next_zb, jnp.float32)
    is_last = pix != next_pix
    winner = in_band & (is_last | (next_z > z_head + jnp.float32(depth_band)))

    SUM = Xg - h_PR  # (32, Lc): at winners, the in-band segment totals

    # ---- placement: one-hot sub-chunk matmul on the MXU, as in v2 ----
    o_part = carry[10]
    r_part = carry[12]
    slots_masked = jnp.where(winner, pix - o_part, _I32(-1))

    NQ = S // 128
    o_sub = _I32(0)
    for c in range(0 if not skip_placement else 8, 8):
        for j in range(Lc // S):
            sl = slice(j * S, (j + 1) * S)
            w_sub = winner[c : c + 1, sl]
            sl_sub = slots_masked[c : c + 1, sl]
            k_c = jnp.sum(w_sub.astype(_I32))

            vals = (SUM[c : c + 1, sl], SUM[8 + c : 9 + c, sl],
                    SUM[16 + c : 17 + c, sl], SUM[24 + c : 25 + c, sl],
                    h_zb[c : c + 1, sl])
            rows = []
            for v in vals:
                for shift in (0, 8, 16, 24):
                    rows.append(((v >> shift) & 255).astype(jnp.bfloat16))

            if factored:
                # Factorized one-hot: slot d = q*128 + r splits the (S, S)
                # indicator into Q (NQ, S) and R (S, 128) with
                # placed[kq, r] = sum_i v_k[i] Q[q, i] R[i, r] — identical
                # result (slots are unique), same MXU MACs, but the VPU-side
                # indicator build drops from O(S^2) to O(S*128) per chunk.
                d_row = sl_sub - o_sub  # (1, S); winners: in [0, k_c)
                q_iota = jax.lax.broadcasted_iota(_I32, (NQ, S), 0)
                Q = ((d_row >> 7) == q_iota).astype(jnp.bfloat16)  # (NQ, S)
                d_col = d_row.reshape(S, 1)
                R = (
                    ((d_col & 127) == jax.lax.broadcasted_iota(_I32, (S, 128), 1))
                    & (d_col >= 0)
                ).astype(jnp.bfloat16)
                B = jnp.concatenate([rb * Q for rb in rows], axis=0)  # (20*NQ, S)
                placed = jax.lax.dot_general(
                    B, R,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                placed_i = placed.astype(_I32)  # (20*NQ, 128)
                out_rows = []
                for jj in range(5):
                    vblk = (
                        placed_i[(4 * jj) * NQ : (4 * jj + 1) * NQ]
                        | (placed_i[(4 * jj + 1) * NQ : (4 * jj + 2) * NQ] << 8)
                        | (placed_i[(4 * jj + 2) * NQ : (4 * jj + 3) * NQ] << 16)
                        | (placed_i[(4 * jj + 3) * NQ : (4 * jj + 4) * NQ] << 24)
                    )  # (NQ, 128): value jj's S outputs as NQ rows
                    # lane-concat needs every piece at sublane offset 0; row
                    # slices (and lazy sublane rolls) keep a nonzero offset
                    # Mosaic's concat rejects, so extract row q as a masked
                    # sublane REDUCTION (offset-0 by construction)
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
            else:
                sl_col = sl_sub.reshape(S, 1)
                oh = sl_col - o_sub == jax.lax.broadcasted_iota(_I32, (S, S), 1)
                oh_bf = oh.astype(jnp.bfloat16)
                r20 = jnp.concatenate(rows, axis=0)  # (20, S)
                placed = jax.lax.dot_general(
                    r20, oh_bf,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                placed_i = placed.astype(_I32)
                out_rows = []
                for jj in range(5):
                    v = (
                        placed_i[4 * jj : 4 * jj + 1]
                        | (placed_i[4 * jj + 1 : 4 * jj + 2] << 8)
                        | (placed_i[4 * jj + 2 : 4 * jj + 3] << 16)
                        | (placed_i[4 * jj + 3 : 4 * jj + 4] << 24)
                    )
                    out_rows.append(v)
            out8 = jnp.concatenate(
                out_rows + [jnp.zeros((3, S), _I32)], axis=0
            )  # (8, S)

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

    # ---- one aligned DMA of the whole part's rows to the image ----
    carry[11] = ((o_part - r_part) // 128) * 128  # == o_part - r_part (aligned)
    o_al = pl.multiple_of(carry[11], 128)
    dma = pltpu.make_async_copy(
        part_out.at[:, pl.ds(0, L + 256)],
        img_hbm.at[:, pl.ds(o_al, L + 256)],
        out_sem,
    )
    dma.start()

    # ---- carry the trailing partial 128-lane tile to the next part ----
    end = r_part + o_sub
    carry[13] = (end // 128) * 128
    tail_al = pl.multiple_of(carry[13], 128)
    dma.wait()
    tail = part_out[:, pl.ds(tail_al, 128)]
    part_out[:, pl.ds(0, 128)] = tail
    r_next = end - tail_al

    # ---- update carries (scalars from the last element = row 7 lane -1) ----
    last = Lc - 1
    carry[0] = Xg[7, last]
    carry[1] = Xg[15, last]
    carry[2] = Xg[23, last]
    carry[3] = Xg[31, last]
    carry[4] = pix[7, last]
    carry[5] = H[39, last]
    carry[6] = H[7, last]
    carry[7] = H[15, last]
    carry[8] = H[23, last]
    carry[9] = H[31, last]
    carry[10] = o_part + o_sub
    carry[12] = r_next


def raster_images_pallas3(
    sp: SortedPoints,
    hw: int,
    depth_band: float,
    part_size: int = 16384,
    sub_chunk: int = 2048,  # v5e optimum w/ factored placement (profile_resolve:
    # factored S=2048 8.32 ms vs one-hot S=1024 9.11 ms on the 7.07M stream)
    interpret: bool = False,
    skip_placement: bool = False,
    skip_scans: bool = False,
    factored: bool = True,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dense (sums (HW,3) i32, count (HW,) i32, depth (HW,) f32) via the
    v3 double-buffered MXU-scan fused resolve. Same contract as
    raster.raster_images (requires carriers in ``sp``)."""
    m = sp.pix.shape[0]
    L = part_size
    assert L % 8 == 0
    Lc = L // 8
    assert Lc % 128 == 0
    S = min(sub_chunk, Lc)
    assert Lc % S == 0 and S % 128 == 0
    P = -(-m // L)
    pad = P * L + 8 * Lc - m  # + 8 lookahead rows (16-row aligned DMA)

    z_bits = jax.lax.bitcast_convert_type(sp.z, jnp.int32)
    packed = (
        sp.rgb[:, 0]
        | (sp.rgb[:, 1] << 8)
        | (sp.rgb[:, 2] << 16)
        | jnp.where(sp.is_real, jnp.int32(_REAL_BIT), 0)
    )

    def padit(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]).reshape(-1, Lc)

    pix_p = padit(sp.pix, jnp.int32(hw))  # sentinel: culled
    zb_p = padit(z_bits, jax.lax.bitcast_convert_type(jnp.float32(jnp.inf), jnp.int32))
    packed_p = padit(packed, jnp.int32(0))

    # constant upper-triangular ones: tri[j, i] = 1 iff j <= i, at the
    # block-scan tile size (VMEM-bounded; see kernel)
    TS = min(512, Lc)
    assert Lc % TS == 0
    tri = (
        jax.lax.broadcasted_iota(jnp.int32, (TS, TS), 0)
        <= jax.lax.broadcasted_iota(jnp.int32, (TS, TS), 1)
    ).astype(jnp.bfloat16)

    out_w = hw + L + 1024

    img = pl.pallas_call(
        functools.partial(_resolve_kernel3, Lc=Lc, S=S, hw=hw, depth_band=depth_band,
                          skip_placement=skip_placement, skip_scans=skip_scans,
                          factored=factored),
        out_shape=jax.ShapeDtypeStruct((8, out_w), jnp.int32),
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, 16, Lc), jnp.int32),
            pltpu.VMEM((2, 16, Lc), jnp.int32),
            pltpu.VMEM((2, 8, Lc), jnp.int32),
            pltpu.VMEM((TS, TS), jnp.bfloat16),
            pltpu.VMEM((8, L + 256), jnp.int32),
            pltpu.SMEM((16,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pix_p, zb_p, packed_p, tri)

    img = img[:, :hw]
    sums = jnp.stack([img[0], img[1], img[2]], axis=1)
    count = img[3]
    depth = jax.lax.bitcast_convert_type(img[4], jnp.float32)
    return sums, count, depth
