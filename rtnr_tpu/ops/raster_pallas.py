"""Pallas TPU kernel: fused raster resolve (band logic + dense placement).

Replaces the multi-pass XLA resolve (rtnr_tpu.ops.raster_partitioned) with
ONE streaming pass over the sorted point+carrier stream:

- grid iterates parts of the stream sequentially on the core; cross-part
  state (running color/count prefix sums, the open segment's head info,
  the global output offset) lives in SMEM scratch and persists across grid
  steps — the Pallas idiom for carry-style streaming kernels;
- per part, segment logic (head detection, head-depth broadcast, the 2 cm
  band prefix, cumsum differences) runs as lane-vector ops with
  log2(L) masked-roll doubling steps — VPU work on VMEM-resident data;
- placement uses the invariant that the k-th winner's output row IS its
  pixel id: winners in a sub-chunk occupy a contiguous output range, so a
  sub-chunk one-hot matmul on the MXU (bf16 one-hot x byte-split rows,
  exact) compacts winners, and a single dynamic-offset DMA per part writes
  the finished rows to the image in HBM;
- the image is channels-first (8, HW') so every tensor keeps elements on
  the 128-tiled lane axis and all dynamic stores/DMAs slice lanes.

Bit-exact with raster.raster_images (asserted in interpret-mode tests).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rtnr_tpu.config import DEPTH_EMPTY
from rtnr_tpu.ops.raster import SortedPoints

_REAL_BIT = 1 << 24


def _roll_r(x: jax.Array, s: int) -> jax.Array:
    """Roll lanes right by s (element i-s arrives at lane i), wrap masked by
    callers via lane predicates."""
    return pltpu.roll(x, s, axis=1)


def _resolve_kernel(
    # inputs (HBM)
    pix_hbm,
    zb_hbm,
    packed_hbm,
    # output (HBM)
    img_hbm,
    # scratch
    pix_v,
    zb_v,
    packed_v,
    part_out,
    carry,  # SMEM (16,) int32
    in_sem,
    out_sem,
    *,
    L: int,
    S: int,
    hw: int,
    depth_band: float,
):
    p = pl.program_id(0)
    L1 = L + 1024  # owned lanes + halo (1 used) + pad; 1024-aligned for DMA tiling
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L1), 1)

    # ---- load part [p*L, p*L + L + 1) + pad ----
    cp = pltpu.make_async_copy(pix_hbm.at[:, pl.ds(p * L, L1)], pix_v.at[:, :], in_sem.at[0])
    cz = pltpu.make_async_copy(zb_hbm.at[:, pl.ds(p * L, L1)], zb_v.at[:, :], in_sem.at[1])
    ck = pltpu.make_async_copy(packed_hbm.at[:, pl.ds(p * L, L1)], packed_v.at[:, :], in_sem.at[2])
    cp.start()
    cz.start()
    ck.start()

    @pl.when(p == 0)
    def _():
        for i in range(14):
            carry[i] = 0
        carry[4] = -1  # open_pix: nothing open
        carry[5] = 0x7F7FFFFF  # FLT_MAX bits: open z_head default

    cp.wait()
    cz.wait()
    ck.wait()

    pix = pix_v[:, :]
    zb = zb_v[:, :]
    packed = packed_v[:, :]

    owned = lane < L
    halo_ok = lane < (L + 1)

    real = ((packed >> 24) & 1) * halo_ok.astype(jnp.int32)
    r = packed & 255
    g = (packed >> 8) & 255
    b = (packed >> 16) & 255
    ok = (pix < hw) & halo_ok

    open_pix = carry[4]
    prev_pix = jnp.where(lane == 0, open_pix, _roll_r(pix, 1))
    is_head = (pix != prev_pix) & halo_ok

    # ---- local inclusive cumsum of (r,g,b,1)*real over lanes ----
    def cumsum(v):
        out = v
        s = 1
        while s < L1:
            out = out + jnp.where(lane >= s, _roll_r(out, s), 0)
            s *= 2
        return out

    cr = cumsum(r * real)
    cg = cumsum(g * real)
    cb = cumsum(b * real)
    cn = cumsum(real)
    # global csum = local + carry (carry counts owned lanes of prior parts)
    cr = cr + carry[0]
    cg = cg + carry[1]
    cb = cb + carry[2]
    cn = cn + carry[3]

    # prev csum (value just before each lane; lane 0 <- carry)
    pr = jnp.where(lane == 0, carry[0], _roll_r(cr, 1))
    pg = jnp.where(lane == 0, carry[1], _roll_r(cg, 1))
    pb = jnp.where(lane == 0, carry[2], _roll_r(cb, 1))
    pn = jnp.where(lane == 0, carry[3], _roll_r(cn, 1))

    # ---- head broadcast (prev csums + z bits at head) ----
    hp = jnp.where(is_head, lane, -1)
    s = 1
    while s < L1:
        hp = jnp.maximum(hp, jnp.where(lane >= s, _roll_r(hp, s), -1))
        s *= 2
    no_head = hp < 0
    dist = lane - jnp.maximum(hp, 0)

    def bcast(v, open_val):
        out = v
        s = 1
        while s < L1:
            out = jnp.where(dist < s, out, _roll_r(out, s))
            s *= 2
        return jnp.where(no_head, open_val, out)

    h_pr = bcast(pr, carry[6])
    h_pg = bcast(pg, carry[7])
    h_pb = bcast(pb, carry[8])
    h_pn = bcast(pn, carry[9])
    h_zb = bcast(zb, carry[5])

    z = jax.lax.bitcast_convert_type(zb, jnp.float32)
    z_head = jax.lax.bitcast_convert_type(h_zb, jnp.float32)
    in_band = ok & jnp.logical_not(z > z_head + jnp.float32(depth_band))
    # lane i receives former lane i+1 (roll right by L1-1 == left by 1);
    # bool vectors can't rotate on TPU — roll as int32
    next_in = _roll_r(in_band.astype(jnp.int32), L1 - 1) == 1
    next_pix = _roll_r(pix, L1 - 1)
    is_last = pix != next_pix
    winner = in_band & (is_last | jnp.logical_not(next_in)) & owned

    sum_r = cr - h_pr
    sum_g = cg - h_pg
    sum_b = cb - h_pb
    cnt = cn - h_pn

    o_part = carry[10]
    r_part = carry[12]
    slots = pix - o_part  # winner's row within this part's output range

    # ---- sub-chunk one-hot placement on the MXU ----
    slots_masked = jnp.where(winner, slots, jnp.int32(-1))
    o_sub = jnp.int32(0)
    for c in range(L // S):
        w_sub = winner[:, c * S : (c + 1) * S]
        sl_sub = slots_masked[:, c * S : (c + 1) * S]
        k_c = jnp.sum(w_sub.astype(jnp.int32))

        # columns: (S, 1) views of the sub-chunk slots/winner
        sl_col = sl_sub.reshape(S, 1)
        # one-hot[e, s] = (slots[e] - o_sub == s)  (non-winners: slot -1)
        oh = (sl_col - o_sub == jax.lax.broadcasted_iota(jnp.int32, (S, S), 1))
        oh_bf = oh.astype(jnp.bfloat16)

        # rows: 20 byte-split lanes (5 int32 values x 4 bytes, all >= 0)
        vals = (sum_r, sum_g, sum_b, cnt, h_zb)
        rows = []
        for v in vals:
            v_sub = v[:, c * S : (c + 1) * S]
            for shift in (0, 8, 16, 24):
                rows.append(((v_sub >> shift) & 255).astype(jnp.bfloat16))
        r20 = jnp.concatenate(rows, axis=0)  # (20, S)

        placed = jax.lax.dot_general(
            r20, oh_bf,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (20, S): row j at output slot s

        placed_i = placed.astype(jnp.int32)
        out_rows = []
        for j in range(5):
            v = (
                placed_i[4 * j]
                | (placed_i[4 * j + 1] << 8)
                | (placed_i[4 * j + 2] << 16)
                | (placed_i[4 * j + 3] << 24)
            )
            out_rows.append(v)
        out8 = jnp.stack(
            out_rows + [jnp.zeros_like(out_rows[0])] * 3, axis=0
        )  # (8, S)
        # VMEM vector stores/loads demand 128-aligned dynamic lane offsets;
        # write the tile with an align-down + dynamic-roll + masked merge
        # into the part buffer (pl.multiple_of proves alignment to Mosaic).
        q = r_part + o_sub  # tile start within the part buffer (arbitrary)
        carry[11] = (q // 128) * 128
        q_al = pl.multiple_of(carry[11], 128)
        rq = q - q_al
        padded = jnp.concatenate(
            [out8, jnp.zeros((8, 128), jnp.int32)], axis=1
        )  # (8, S+128)
        rolled = pltpu.roll(padded, rq, axis=1)  # roll right: lane i -> i+rq
        lane_t = jax.lax.broadcasted_iota(jnp.int32, (8, S + 128), 1)
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
    end = r_part + o_sub  # next r relative to the *new* aligned origin
    carry[13] = (end // 128) * 128
    tail_al = pl.multiple_of(carry[13], 128)
    dma.wait()  # reads below must see final buffer; DMA also done before overwrite
    tail = part_out[:, pl.ds(tail_al, 128)]
    part_out[:, pl.ds(0, 128)] = tail
    r_next = end - tail_al

    # ---- update carries (scalars from the last owned lane) ----
    last = L - 1
    carry[0] = cr[0, last]
    carry[1] = cg[0, last]
    carry[2] = cb[0, last]
    carry[3] = cn[0, last]
    carry[4] = pix[0, last]
    carry[5] = h_zb[0, last]
    carry[6] = h_pr[0, last]
    carry[7] = h_pg[0, last]
    carry[8] = h_pb[0, last]
    carry[9] = h_pn[0, last]
    carry[10] = o_part + o_sub
    carry[12] = r_next


def raster_images_pallas(
    sp: SortedPoints,
    hw: int,
    depth_band: float,
    part_size: int = 16384,
    sub_chunk: int = 2048,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dense (sums (HW,3) int32, count (HW,) int32, depth (HW,) f32) via the
    fused Pallas resolve. Same contract as raster.raster_images (requires
    carriers in sp)."""
    m = sp.pix.shape[0]
    L = part_size
    S = sub_chunk
    assert L % S == 0
    P = -(-m // L)
    pad = P * L + 1024 - m  # + halo/pad region (1024-aligned DMA slices)

    z_bits = jax.lax.bitcast_convert_type(sp.z, jnp.int32)
    packed = (
        sp.rgb[:, 0]
        | (sp.rgb[:, 1] << 8)
        | (sp.rgb[:, 2] << 16)
        | jnp.where(sp.is_real, jnp.int32(_REAL_BIT), 0)
    )

    def padit(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]).reshape(1, -1)

    pix_p = padit(sp.pix, jnp.int32(hw))  # sentinel: culled
    zb_p = padit(z_bits, jax.lax.bitcast_convert_type(jnp.float32(jnp.inf), jnp.int32))
    packed_p = padit(packed, jnp.int32(0))

    out_w = hw + L + 1024

    img = pl.pallas_call(
        functools.partial(
            _resolve_kernel, L=L, S=S, hw=hw, depth_band=depth_band
        ),
        out_shape=jax.ShapeDtypeStruct((8, out_w), jnp.int32),
        grid=(P,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, L + 1024), jnp.int32),
            pltpu.VMEM((1, L + 1024), jnp.int32),
            pltpu.VMEM((1, L + 1024), jnp.int32),
            pltpu.VMEM((8, L + 256), jnp.int32),
            pltpu.SMEM((16,), jnp.int32),
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(pix_p, zb_p, packed_p)

    img = img[:, :hw]
    sums = jnp.stack([img[0], img[1], img[2]], axis=1)
    count = img[3]
    depth = jax.lax.bitcast_convert_type(img[4], jnp.float32)
    return sums, count, depth
