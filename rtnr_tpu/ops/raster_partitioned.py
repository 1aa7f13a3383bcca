"""Partitioned (two-level) raster resolve — the fast path at scale.

``rtnr_tpu.ops.raster.raster_images`` computes segment logic with full-array
Hillis-Steele scans (log2 M passes over M elements) and materializes the
dense image with one global placement sort of M elements. Both costs shrink
with a classic two-level decomposition, all in XLA:

- the sorted stream reshapes to (P, L) parts; scans/cumsums run per-part
  (vmapped, log2 L passes) with tiny (P,)-sized carry scans stitched across
  part boundaries;
- placement exploits that winners (exactly one per pixel) appear in pixel
  order: part p's winners occupy the contiguous output range
  [w_p, w_p + k_p). A vmapped per-part sort moves winners to the front of
  each part, and a sequential ``lax.fori_loop`` of
  ``dynamic_update_slice(image, part_rows, (w_p, 0))`` writes each part —
  the overwrite of trailing garbage by later parts is exact because w_p is
  nondecreasing. Sorting P parts of L elements costs
  (log L / log M)^2 of the monolithic sort.

Bit-exact with the monolithic path (asserted in tests at several (P, L)
shapes); selected automatically for large streams.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rtnr_tpu.config import DEPTH_EMPTY
from rtnr_tpu.ops.raster import SortedPoints, _shift_left, _shift_right

_NEG1 = jnp.int32(-1)


def _part_carry_scan(last_vals: jax.Array, has_head: jax.Array, init) -> jax.Array:
    """Tiny sequential-semantics scan over part boundaries: carry[p] = value
    of the open segment entering part p. last_vals[p] = locally-resolved
    value at the end of part p; has_head[p] = part p contains a head.
    Computed with doubling over P (P is tiny)."""
    p = last_vals.shape[0]
    # carry into part p = last_vals[q] for the latest q < p with has_head[q],
    # else init.
    vals = jnp.where(has_head[:, None] if last_vals.ndim == 2 else has_head,
                     last_vals, jnp.full_like(last_vals, init))
    found = has_head
    out = vals
    shift = 1
    while shift < p:
        prev_out = jnp.concatenate([out[:shift], out[:-shift]], axis=0)
        prev_found = jnp.concatenate([jnp.zeros((shift,), bool), found[:-shift]])
        sel = found if out.ndim == 1 else found[:, None]
        out = jnp.where(sel, out, prev_out)
        found = found | prev_found
        shift *= 2
    # shift right by one: carry INTO part p comes from parts < p
    out = jnp.concatenate(
        [jnp.full_like(out[:1], init), out[:-1]], axis=0
    )
    return out


def _local_broadcast_head(values, is_head, L):
    """Per-part segmented head broadcast (vmapped over parts).

    values: (P, L) or (P, L, K); is_head: (P, L). Elements before their
    part's first head get the value at local index 0 marker resolved later
    via carries (returned mask selects them)."""
    idx = jnp.arange(L, dtype=jnp.int32)
    hp = jax.lax.cummax(jnp.where(is_head, idx[None, :], _NEG1), axis=1)
    no_head_yet = hp < 0
    dist = idx[None, :] - jnp.maximum(hp, 0)
    v = values
    shift = 1
    while shift < L:
        sel = dist < shift
        if v.ndim == 3:
            sel = sel[:, :, None]
        v_prev = jnp.concatenate([v[:, :shift], v[:, :-shift]], axis=1)
        v = jnp.where(sel, v, v_prev)
        shift *= 2
    return v, no_head_yet


def raster_images_partitioned(
    sp: SortedPoints,
    hw: int,
    depth_band: float,
    part_size: int = 1 << 14,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dense (sums (HW,3) int32, count (HW,) int32, depth (HW,) f32).

    Same contract as raster.raster_images (requires carriers in sp).
    """
    m = sp.pix.shape[0]
    L = min(part_size, max(256, m))
    P = -(-m // L)
    pad = P * L - m

    def padded(x, fill):
        if pad == 0:
            return x
        fill_arr = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, fill_arr], axis=0)

    # Flat elementwise precompute (cheap single passes).
    idx_flat = jnp.arange(m, dtype=jnp.int32)
    real = sp.is_real.astype(jnp.int32)
    contrib4 = jnp.concatenate([sp.rgb * real[:, None], real[:, None]], axis=1)
    z_bits = jax.lax.bitcast_convert_type(sp.z, jnp.int32)

    pixP = padded(sp.pix, jnp.int32(hw + 1)).reshape(P, L)
    zP = padded(sp.z, jnp.float32(jnp.inf)).reshape(P, L)
    zbP = padded(z_bits, jnp.int32(0)).reshape(P, L)
    okP = padded(sp.ok, False).reshape(P, L)
    headP = padded(sp.is_head, False).reshape(P, L)
    c4P = padded(contrib4, jnp.int32(0)).reshape(P, L, 4)

    # ---- two-level cumsum of contrib4 -> global csum4 ----
    local_c4 = jnp.cumsum(c4P, axis=1, dtype=jnp.int32)  # (P, L, 4)
    part_tot = local_c4[:, -1, :]  # (P, 4)
    carry_c4 = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.int32), jnp.cumsum(part_tot, axis=0)[:-1]], axis=0
    )  # (P, 4) exclusive
    csum4 = local_c4 + carry_c4[:, None, :]  # global inclusive csum
    prev4 = jnp.concatenate(
        [jnp.zeros((P, 1, 4), jnp.int32), csum4[:, :-1]], axis=1
    )
    # cross-part: first element of part p needs csum4 of last of p-1
    prev4 = prev4.at[1:, 0].set(csum4[:-1, -1])

    # ---- two-level head broadcast of (prev4, z_bits) ----
    head_vals = jnp.concatenate([prev4, zbP[:, :, None]], axis=2)  # (P, L, 5)
    bcast, no_head_yet = _local_broadcast_head(head_vals, headP, L)
    # carry: the open-segment head value entering each part =
    # locally-resolved value at end of part p-1 (which is globally correct
    # after its own carry...). Standard trick: last element's local value is
    # globally correct iff its head is in the same part; chain via the tiny
    # scan below.
    part_last_val = bcast[:, -1]  # (P, 5)
    part_has_head = jnp.any(headP, axis=1)  # (P,)
    carry_vals = _part_carry_scan(part_last_val, part_has_head, 0)
    head_info = jnp.where(no_head_yet[:, :, None], carry_vals[:, None, :], bcast)

    prev4_head = head_info[:, :, :4]
    z_head = jax.lax.bitcast_convert_type(head_info[:, :, 4], jnp.float32)

    # ---- band + winners (flat-style elementwise on (P, L)) ----
    in_band = okP & ~(zP > z_head + jnp.float32(depth_band))
    flat_in = in_band.reshape(-1)
    next_in = _shift_left(flat_in, False).reshape(P, L)
    flat_last = padded(sp.is_last, False).reshape(P, L)
    winner = in_band & (flat_last | ~next_in)

    sums4 = csum4 - prev4_head  # (P, L, 4) at winners: band totals
    rows = jnp.concatenate([sums4, head_info[:, :, 4:5]], axis=2)  # (P, L, 5)

    # ---- per-part placement sort + sequential dense write ----
    big = jnp.int32(hw + 1)
    keys = jnp.where(winner, pixP, big)
    ops = (keys,) + tuple(rows[:, :, c] for c in range(5))
    sorted_ops = jax.vmap(lambda *o: jax.lax.sort(o, num_keys=1))(*ops)
    part_rows = jnp.stack(sorted_ops[1:], axis=2)  # (P, L, 5) winners first

    k_per_part = jnp.sum(winner.astype(jnp.int32), axis=1)  # (P,)
    w_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(k_per_part)[:-1]]
    )

    image0 = jnp.zeros((hw + L, 5), jnp.int32)

    def body(p, img):
        return jax.lax.dynamic_update_slice(
            img, jax.lax.dynamic_slice_in_dim(part_rows, p, 1, axis=0)[0],
            (w_off[p], jnp.int32(0)),
        )

    image = jax.lax.fori_loop(0, P, body, image0)[:hw]

    sums = image[:, :3]
    count = image[:, 3]
    depth = jax.lax.bitcast_convert_type(image[:, 4], jnp.float32)
    return sums, count, depth
