"""Differentiable splat raster — pixel gradients to colors, positions, pose.

The reference renderer is inference-only (``NoGradGuard``, reference
project_cloud.cu:473); differentiability is a north-star addition
(BASELINE.md). Design:

- The (pixel, depth) sort runs entirely on **integers** (depth as its
  float32 bit pattern, order-preserving for positive depths — the same trick
  the reference's atomicMin plays with float-as-uint bits, render.cu:72-81),
  producing a permutation. All float data flows through differentiable
  gathers by that permutation, cumulative sums (linear), and unique-index
  scatters. JAX autodiff then yields exact gradients with no custom VJP:

  * d rgb / d colors: each in-band point receives g[pixel]/count — exact.
  * d depth / d z -> d positions, d cam_proj rows: exact (z is linear in
    both via the projection).
  * Pixel assignment and band membership are piecewise-constant in
    positions/pose; their contribution is zero almost everywhere and is
    deliberately stop-gradient'ed (documented straight-through choice).

- Forward outputs float RGB (sum/count true division, range [0, 255]) —
  the differentiable counterpart of the integer-average resolve
  (render.cu:160-162); empty pixels are 0 with FLT_MAX depth.

``rasterize_diff`` matches ``rasterize``'s hard output when rounded
(floor division vs true division differ by < 1 LSB).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtnr_tpu.config import DEPTH_EMPTY
from rtnr_tpu.ops.raster import (
    _pixel_ids,
    _shift_left,
    _shift_right,
    place_rows_by_pixel,
    project_points,
    segment_broadcast_head,
)


class DiffRaster(NamedTuple):
    rgb: jax.Array  # (H, W, 3) float32, 0..255, 0 where empty
    depth: jax.Array  # (H, W) float32, FLT_MAX where empty
    count: jax.Array  # (H, W) int32 contributing points per pixel
    mask: jax.Array  # (H, W) bool occupancy


def _sort_permutation(pix: jax.Array, z: jax.Array, n: int) -> jax.Array:
    """Stable permutation ordering by (pixel id, depth), integer-only sort."""
    z_bits = jax.lax.bitcast_convert_type(z, jnp.int32)
    # valid z > 0 => positive float => positive int bits, order-preserving;
    # culled points carry sentinel pixel id and sort to the tail regardless.
    z_key = jnp.where(pix < jnp.max(pix) + 1, z_bits, jnp.int32(2**31 - 1))
    idx = jnp.arange(n, dtype=jnp.int32)
    _, _, perm = jax.lax.sort((pix, z_key, idx), num_keys=2)
    return perm


@functools.partial(jax.jit, static_argnames=("width", "height"))
def rasterize_diff(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
    depth_band: float = 0.02,
) -> DiffRaster:
    """Differentiable raster. colors: (N,3) float32 (0..255 scale)."""
    n = points.shape[0]
    hw = width * height
    u, v, z = project_points(points, cam_proj.astype(jnp.float32))
    pix, ok = _pixel_ids(u, v, z, valid, width, height)
    pix = jax.lax.stop_gradient(pix)

    perm = _sort_permutation(pix, jax.lax.stop_gradient(z), n)
    pix_s = jnp.take(pix, perm)
    z_s = jnp.take(z, perm)  # differentiable gather (sort permutation)
    rgb_s = jnp.take(colors.astype(jnp.float32), perm, axis=0)
    ok_s = pix_s < hw

    idx = jnp.arange(n, dtype=jnp.int32)
    is_head = pix_s != _shift_right(pix_s, jnp.int32(-1))
    is_last = pix_s != _shift_left(pix_s, jnp.int32(-2))
    # Gather-free head-depth broadcast (see ops/raster.py raster_images).
    min_d = segment_broadcast_head(jax.lax.stop_gradient(z_s), is_head)

    # Band membership: straight-through (piecewise constant in inputs).
    # Within a segment the band admits a prefix (depth ascends).
    in_band = jax.lax.stop_gradient(ok_s & ~(z_s > min_d + jnp.float32(depth_band)))
    next_in = jnp.concatenate([in_band[1:], jnp.array([False])])
    band_end = in_band & (is_last | ~next_in)

    csum_rgb = jnp.cumsum(rgb_s, axis=0)  # raw prefix sums; banded by cut point
    prev_rgb = jnp.concatenate([jnp.zeros((1, 3), jnp.float32), csum_rgb[:-1]], axis=0)

    drop = jnp.int32(hw)
    end_ids = jnp.where(band_end, pix_s, drop)
    head_ids = jnp.where(ok_s & is_head, pix_s, drop)

    end_img = (
        jnp.zeros((hw, 3), jnp.float32)
        .at[end_ids]
        .set(csum_rgb, mode="drop", unique_indices=True)
    )
    start_img = (
        jnp.zeros((hw, 3), jnp.float32)
        .at[head_ids]
        .set(prev_rgb, mode="drop", unique_indices=True)
    )
    sum_img = end_img - start_img
    cnt_end = (
        jnp.zeros((hw,), jnp.int32)
        .at[end_ids]
        .set(idx + 1, mode="drop", unique_indices=True)
    )
    cnt_head = (
        jnp.zeros((hw,), jnp.int32)
        .at[head_ids]
        .set(idx, mode="drop", unique_indices=True)
    )
    cnt_img = (cnt_end - cnt_head).astype(jnp.float32)
    depth_img = (
        jnp.full((hw,), DEPTH_EMPTY, jnp.float32)
        .at[head_ids]
        .set(z_s, mode="drop", unique_indices=True)
    )

    occupied = cnt_img > 0
    rgb_img = jnp.where(occupied[:, None], sum_img / jnp.maximum(cnt_img, 1.0)[:, None], 0.0)
    return DiffRaster(
        rgb=rgb_img.reshape(height, width, 3),
        depth=depth_img.reshape(height, width),
        count=cnt_img.astype(jnp.int32).reshape(height, width),
        mask=occupied.reshape(height, width),
    )


def camera_pose_gradients(
    dM: jax.Array, K4: jax.Array
) -> jax.Array:
    """Chain cam_proj cotangent dM (4x4) back to extrinsics E: M = K4 @ E."""
    return K4.T @ dM


# ---------------------------------------------------------------------------
# Scalable differentiable raster: sort-based forward + custom VJP
# ---------------------------------------------------------------------------
#
# ``rasterize_diff`` above maps the math directly onto XLA scatters/gathers,
# which serialize on TPU (~100 ns/element — see ops/raster.py docstring):
# fine at toy scale, hopeless at 5M points / 1080p. This version reuses the
# production forward's machinery (integer sort + carriers + cumsum
# differences + placement sort — scatter-free) and supplies the gradients
# manually through a custom VJP, exploiting that everything differentiable
# in the raster is LINEAR once the piecewise-constant decisions (pixel
# assignment, band membership, head identity) are frozen:
#
#   d sums[p] / d color[j]  = [j in-band at p]          (0/1 weights)
#   d depth[p] / d z[j]     = [j is the head of p]      (0/1 weights)
#
# so the backward pass is ONE multi-lane row gather of the cotangent images
# (+ the head-depth image, which re-derives band/head membership per point)
# at each point's own pixel id, then masking and the projection chain — no
# sorts at all in the backward (bwd_from_images; measured ~23 ms vs ~60 ms
# for the former two full-stream sort-merges at 5M/1080p). Pixel/band/head
# decisions are straight-through as documented above (piecewise constant:
# zero gradient almost everywhere).


def _diff_core_fwd_arrays(
    points, colors, cam_proj, valid, *, width, height, depth_band
):
    """Shared forward: returns (sums, cnt, depth) images + residuals.

    Round-3 cost cuts vs the original formulation (each a full pass over
    the ~7M-element stream saved, same math):
    - no idx lane at all (6 -> 5 sorted lanes): carriers are recognized by
      their exact DEPTH_EMPTY depth bits (a real in-range point's z is a
      finite projection result, never FLT_MAX; culled points carry +inf
      bits), and the gather-based backward needs no sorted-order rank;
    - the winner is simply each pixel's CARRIER (FLT_MAX depth sorts last
      in its segment), so no band-end/next-in logic gates the placement;
    - per-pixel banded sums come from DENSE adjacent diffs after the
      placement sort (carriers make winners dense: pixel p's winner lands
      at row p), deleting the 4-lane pre-head prefix broadcast entirely —
      the same csum-diff trick as the production kernels
      (ops/raster_pallas4.py).

    Residuals are ORIGINAL-ORDER (pix, z) — tiny, and they guarantee the
    backward's band/head decisions replay the forward's exact f32 values
    (a backward-side recompute could round differently after fusion).
    """
    n = points.shape[0]
    hw = width * height
    M = cam_proj.astype(jnp.float32)
    u, v, z = project_points(points, M)
    pix, _ok = _pixel_ids(u, v, z, valid, width, height)
    # z >= DEPTH_EMPTY also maps to inf: carriers are identified by their
    # exact DEPTH_EMPTY bit pattern, so no REAL point may carry it (it
    # would duplicate a pixel key into place_rows_by_pixel and shift every
    # subsequent pixel's row). Such a point sorts past the carrier and
    # lands out-of-band — consistently "beyond the far plane".
    zs = jnp.where((pix < hw) & (z < jnp.float32(DEPTH_EMPTY)), z,
                   jnp.float32(jnp.inf))

    z_bits = jax.lax.bitcast_convert_type(zs, jnp.int32)

    import os

    impl = os.environ.get("RTNR_DIFF_FWD", "auto")
    if impl == "auto":
        impl = "compact" if jax.default_backend() == "tpu" else "sort"
    if impl in ("compact", "compact_interpret"):
        # carrier-free forward: sort ONLY the n points (the carrier path
        # sorts n + hw), take each pixel segment's LAST element as the
        # winner carrying the inclusive f32 csums, compact winners by rank
        # (a lean Pallas placement instead of the full-stream placement
        # sort), and expand to the dense images (expand_winners
        # float_sums). Values are bit-identical to the carrier path for
        # distinct (pix, depth) keys: both produce cs[segment end] -
        # cs[previous segment end] in f32. (With is_stable=False, exact
        # duplicate (pix, z_bits) pairs may order differently between the
        # n-point and (n+hw)-carrier sorts, so f32 cumsum rounding can
        # differ there; likewise a real point whose whole segment is +inf
        # is in-band here but out-of-band against a FLT_MAX carrier head.
        # Neither case arises for finite, distinct-depth scenes.)
        from rtnr_tpu.ops.raster_pallas4 import (
            compact_rows_by_rank, expand_winners,
        )

        interp = impl == "compact_interpret"
        cf = colors.astype(jnp.float32)
        pix_s, zb_s, r_s, g_s, b_s = jax.lax.sort(
            (pix, z_bits, cf[:, 0], cf[:, 1], cf[:, 2]), num_keys=2,
            is_stable=False,
        )
        m = pix_s.shape[0]
        z_s = jax.lax.bitcast_convert_type(zb_s, jnp.float32)
        ok_s = pix_s < hw
        is_head = pix_s != _shift_right(pix_s, jnp.int32(-1))
        head_pos = jax.lax.cummax(
            jnp.where(is_head, jnp.arange(m, dtype=jnp.int32), jnp.int32(0))
        )
        zb_head = segment_broadcast_head(zb_s, is_head, head_pos)
        z_head = jax.lax.bitcast_convert_type(zb_head, jnp.float32)
        in_band = ok_s & ~(z_s > z_head + jnp.float32(depth_band))
        w_s = in_band.astype(jnp.float32)
        cs_r = jnp.cumsum(r_s * w_s)
        cs_g = jnp.cumsum(g_s * w_s)
        cs_b = jnp.cumsum(b_s * w_s)
        cs_c = jnp.cumsum(w_s)

        is_last = pix_s != _shift_left(pix_s, jnp.int32(-2))
        winner = is_last & ok_s
        wi = winner.astype(jnp.int32)
        rank_incl = jnp.cumsum(wi)
        rank_excl = rank_incl - wi
        slot = jnp.where(winner, rank_excl, jnp.int32(-1))
        total = rank_incl[-1]

        bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        L = 16384
        wimg = compact_rows_by_rank(
            slot, [bc(cs_r), bc(cs_g), bc(cs_b), bc(cs_c), zb_head, pix_s],
            total, part_size=L, part_starts=rank_excl[::L],
            interpret=interp,
        )
        sums3, cntf, depth = expand_winners(
            wimg, total, hw, float_sums=True, interpret=interp,
        )
        return (sums3, cntf, depth), (pix, zs)

    empty_bits = jax.lax.bitcast_convert_type(
        jnp.float32(DEPTH_EMPTY), jnp.int32
    )
    carrier_pix = jnp.arange(hw, dtype=jnp.int32)
    carrier_zb = jnp.full((hw,), empty_bits, jnp.int32)
    pix_all = jnp.concatenate([pix, carrier_pix])
    zb_all = jnp.concatenate([z_bits, carrier_zb])
    cf = colors.astype(jnp.float32)
    r_all = jnp.concatenate([cf[:, 0], jnp.zeros((hw,), jnp.float32)])
    g_all = jnp.concatenate([cf[:, 1], jnp.zeros((hw,), jnp.float32)])
    b_all = jnp.concatenate([cf[:, 2], jnp.zeros((hw,), jnp.float32)])

    pix_s, zb_s, r_s, g_s, b_s = jax.lax.sort(
        (pix_all, zb_all, r_all, g_all, b_all), num_keys=2,
        is_stable=False,
    )
    m = pix_s.shape[0]
    real_s = zb_s != empty_bits
    z_s = jax.lax.bitcast_convert_type(zb_s, jnp.float32)
    ok_s = pix_s < hw
    is_head = pix_s != _shift_right(pix_s, jnp.int32(-1))
    head_pos = jax.lax.cummax(
        jnp.where(is_head, jnp.arange(m, dtype=jnp.int32), jnp.int32(0))
    )

    zb_head = segment_broadcast_head(zb_s, is_head, head_pos)
    z_head = jax.lax.bitcast_convert_type(zb_head, jnp.float32)
    in_band = ok_s & ~(z_s > z_head + jnp.float32(depth_band))

    w_s = jnp.where(in_band & real_s, jnp.float32(1.0), 0.0)
    # 1-D cumsums (a (m, 4)-stacked cumsum puts 4 on the minor dim — a
    # 128-lane-padded layout XLA then scans 32x undersubscribed)
    cs_r = jnp.cumsum(r_s * w_s)
    cs_g = jnp.cumsum(g_s * w_s)
    cs_b = jnp.cumsum(b_s * w_s)
    cs_c = jnp.cumsum(w_s)

    # place INCLUSIVE csums at the carriers (exactly one per pixel, at its
    # segment's end); dense adjacent diffs recover the per-pixel sums
    key = jnp.where(~real_s & ok_s, pix_s, jnp.int32(hw))
    rr, gg, bb, cc, zz = place_rows_by_pixel(
        key, (cs_r, cs_g, cs_b, cs_c, zb_head), hw
    )

    def ddiff(x):
        return x - jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])

    sums = jnp.stack([ddiff(rr), ddiff(gg), ddiff(bb)], axis=1)
    depth = jax.lax.bitcast_convert_type(zz, jnp.float32)
    # original-order residuals: the backward re-derives band/head per POINT
    # from the dense depth image (see bwd_from_images) — no sorted-order
    # state crosses the fwd/bwd boundary.
    residuals = (pix, zs)
    return (sums, ddiff(cc), depth), residuals


def bwd_from_images(
    g_sums: jax.Array,
    g_depth: jax.Array,
    depth_img: jax.Array,
    pix: jax.Array,
    z: jax.Array,
    hw: int,
    depth_band: float,
    own: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Sort-free backward: ONE multi-lane row gather replaces the former
    two full-stream sort-merges (interleave + un-permute).

    Everything the VJP needs per point j is a function of dense images at
    j's own pixel (reference band semantics, render.cu:101-106):

      in_band_j = ok_j  &  z_j <= depth[pix_j] + band
      head_j    = ok_j  &  z_j == depth[pix_j]
      g_colors[j] = in_band_j * g_sums[pix_j]
      gz[j]       = head_j    * g_depth[pix_j]

    so the backward is a single (hw, 5..6)-row ``jnp.take`` at the point's
    pixel id (measured ~23 ms for 5M random rows vs ~60 ms for the sort
    pair at the bench shape; block-sorted scenes gather coherently and do
    better). The head test replays the forward's exact f32 head depth
    (``depth_img`` IS the head's z), so it selects exactly the point the
    forward's sort chose — exact whenever per-pixel depths are distinct;
    on an exact z tie every tied point receives the full depth cotangent
    (a one-sided-derivative convention on a measure-zero set).

    ``own`` (optional, (hw,) int): per-shard pixel ownership for the
    point-sharded path — gates the depth cotangent so exactly one shard's
    head point receives it (parallel/diff.py).
    """
    lanes = [g_sums[:, 0], g_sums[:, 1], g_sums[:, 2], g_depth, depth_img]
    if own is not None:
        lanes.append(own.astype(jnp.float32))
    table = jnp.stack(lanes, axis=1)
    ok = pix < hw
    rows = jnp.take(table, jnp.where(ok, pix, 0), axis=0)
    zh = rows[:, 4]
    in_band = ok & ~(z > zh + jnp.float32(depth_band))
    head = ok & (z == zh)
    if own is not None:
        head = head & (rows[:, 5] > 0)
    g_colors = rows[:, 0:3] * in_band[:, None].astype(jnp.float32)
    gz = rows[:, 3] * head.astype(jnp.float32)
    return g_colors, gz


def rasterize_diff_sorted(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
    depth_band: float = 0.02,
) -> DiffRaster:
    """Scalable differentiable raster (sort-based forward, custom VJP).

    Same contract and gradients as ``rasterize_diff``; runs at production
    scale (5M points / 1080p) because neither pass contains a scatter or a
    per-element gather.
    """
    n = points.shape[0]
    hw = width * height

    @jax.custom_vjp
    def core(points, colors, cam_proj):
        (sums, cnt, depth), _ = _diff_core_fwd_arrays(
            points, colors, cam_proj, valid,
            width=width, height=height, depth_band=depth_band,
        )
        return sums, cnt, depth

    def core_fwd(points, colors, cam_proj):
        out, residuals = _diff_core_fwd_arrays(
            points, colors, cam_proj, valid,
            width=width, height=height, depth_band=depth_band,
        )
        # out[2] is the dense head-depth image — the only image-sized
        # residual the gather backward needs
        return out, (residuals, out[2], points, cam_proj.astype(jnp.float32))

    def core_bwd(res, cts):
        (pix, z), depth_img, pts, M = res
        g_sums, _g_cnt, g_depth = cts
        # one multi-lane row gather at each point's pixel (bwd_from_images)
        g_colors, gz = bwd_from_images(
            g_sums, g_depth, depth_img, pix, z, hw, depth_band
        )
        # chain depth cotangent through z = p . M[2,:3] + M[2,3]
        g_points = gz[:, None] * M[2, :3][None, :]
        g_M = jnp.zeros((4, 4), jnp.float32).at[2, :3].set(gz @ pts).at[2, 3].set(
            jnp.sum(gz)
        )
        return g_points.astype(points.dtype), g_colors, g_M.astype(cam_proj.dtype)

    core.defvjp(core_fwd, core_bwd)

    sums, cnt, depth = core(points, colors, cam_proj)
    cntf = cnt.astype(jnp.float32)
    occupied = cntf > 0
    rgb = jnp.where(occupied[:, None], sums / jnp.maximum(cntf, 1.0)[:, None], 0.0)
    return DiffRaster(
        rgb=rgb.reshape(height, width, 3),
        depth=depth.reshape(height, width),
        count=cnt.astype(jnp.int32).reshape(height, width),
        mask=occupied.reshape(height, width),
    )
