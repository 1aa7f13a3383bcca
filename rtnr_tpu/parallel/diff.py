"""Point-sharded differentiable raster: scene/pose gradients across the mesh.

BASELINE.json config 4 / SURVEY.md §2 gradient row: raster custom-VJP
gradients (point positions, colors, camera pose) must merge over the device
mesh, not just U-Net parameter grads. The reference has no analog (it is
inference-only under ``NoGradGuard``, reference project_cloud.cu:473-474,
and strictly single-GPU — SURVEY.md §2 parallelism checklist).

Design — the forward reuses the proven point-sharding merge structure of
``parallel/render.py`` (per-shard carrier sort → ``pmin`` z-buffer merge →
band test against the *global* minimum → ``psum`` of color sums, matching
the reference's two-pass semantics, render.cu:53-130) in the float/linear
formulation of ``ops/raster_diff.py``. The backward is supplied by a custom
VJP whose bwd pass is itself a ``shard_map``:

- color cotangents: each shard row-gathers the (replicated) gradient
  images at its own points' pixel ids and masks by band membership
  re-derived from the global z-buffer (ops/raster_diff.bwd_from_images) —
  grads land on the owning shard with no cross-device traffic.
- depth cotangents: exactly ONE shard owns each pixel's z-buffer head
  (lowest mesh rank among depth ties, chosen with a second ``pmin`` in the
  forward), so the depth gradient flows to exactly one point globally —
  identical in sum to the single-device VJP.
- camera cotangent: per-shard partials ``psum`` to the replicated (4,4)
  gradient — the "gradient all-reduce" of the SURVEY checklist applied to
  the raster itself.

Pixel assignment and band membership stay straight-through (piecewise
constant), exactly as documented in ops/raster_diff.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rtnr_tpu.config import DEPTH_EMPTY
from rtnr_tpu.ops.raster import (
    _pixel_ids,
    _shift_left,
    _shift_right,
    place_rows_by_pixel,
    project_points,
)
from rtnr_tpu.ops.raster_diff import DiffRaster

_I32_MAX = jnp.int32(2**31 - 1)


def _fwd_shard(pts, cols, val, M, *, width, height, depth_band, axis):
    """Per-shard forward. Returns replicated (sums (HW,3), cnt (HW,),
    depth (HW,)) float32 images + per-shard VJP residuals."""
    n = pts.shape[0]
    hw = width * height
    Mf = M.astype(jnp.float32)
    u, v, z = project_points(pts, Mf)
    pix, _ok = _pixel_ids(u, v, z, val, width, height)
    # z >= DEPTH_EMPTY maps to inf so no real point can alias the carrier
    # bit pattern (see ops/raster_diff.py same guard)
    zs = jnp.where((pix < hw) & (z < jnp.float32(DEPTH_EMPTY)), z,
                   jnp.float32(jnp.inf))
    zb = jax.lax.bitcast_convert_type(zs, jnp.int32)

    import os

    impl = os.environ.get("RTNR_DIFF_FWD", "auto")
    if impl == "auto":
        impl = "compact" if jax.default_backend() == "tpu" else "sort"
    if impl in ("compact", "compact_interpret"):
        return _fwd_shard_compact(
            pts, cols, pix, zs, zb, hw=hw, depth_band=depth_band, axis=axis,
            interp=impl == "compact_interpret",
        )

    # per-shard carriers: every pixel owns a local segment, so the local
    # placement sort stays dense and each shard contributes exactly one
    # (possibly zero) row per pixel to the psum merge
    carrier_pix = jnp.arange(hw, dtype=jnp.int32)
    carrier_zb = jax.lax.bitcast_convert_type(
        jnp.full((hw,), jnp.float32(DEPTH_EMPTY)), jnp.int32
    )
    cf = cols.astype(jnp.float32)
    zeros_hw = jnp.zeros((hw,), jnp.float32)
    pix_s, zb_s, r_s, g_s, b_s = jax.lax.sort(
        (
            jnp.concatenate([pix, carrier_pix]),
            jnp.concatenate([zb, carrier_zb]),
            jnp.concatenate([cf[:, 0], zeros_hw]),
            jnp.concatenate([cf[:, 1], zeros_hw]),
            jnp.concatenate([cf[:, 2], zeros_hw]),
        ),
        num_keys=2,
        is_stable=False,
    )
    empty_bits = jax.lax.bitcast_convert_type(jnp.float32(DEPTH_EMPTY), jnp.int32)
    real_s = zb_s != empty_bits  # carriers carry exact DEPTH_EMPTY bits
    z_s = jax.lax.bitcast_convert_type(zb_s, jnp.float32)
    ok_s = pix_s < hw
    is_head = pix_s != _shift_right(pix_s, jnp.int32(-1))

    # local z-buffer → global min (the reference's two-pass structure: the
    # band is evaluated against the FINAL z-buffer, render.cu:101-106)
    key_head = jnp.where(is_head & ok_s, pix_s, jnp.int32(hw))
    (local_min_b,) = place_rows_by_pixel(key_head, (zb_s,), hw)
    local_min = jax.lax.bitcast_convert_type(local_min_b, jnp.float32)
    global_min = jax.lax.pmin(local_min, axis)

    # depth-gradient ownership: lowest mesh rank among exact-depth ties, so
    # exactly one point globally receives each pixel's depth cotangent
    rank = jax.lax.axis_index(axis).astype(jnp.int32)
    owner = jax.lax.pmin(jnp.where(local_min == global_min, rank, _I32_MAX), axis)
    own_px = (owner == rank).astype(jnp.int32)

    # row-gather the replicated global z-buffer at the sorted pixel ids
    # (bwd_from_images measured row gathers far cheaper than the former
    # gather_images_sorted sort-merge pair)
    min_d_s = jnp.take(global_min, jnp.where(ok_s, pix_s, 0))
    min_d_s = jnp.where(ok_s, min_d_s, jnp.float32(jnp.inf))

    in_band = ok_s & ~(z_s > min_d_s + jnp.float32(depth_band))

    # inclusive csums placed at the CARRIERS (each pixel's local segment
    # end) + dense adjacent diffs — the csum-diff trick of the production
    # kernels; no band-end selection or pre-head broadcast needed
    w_s = jnp.where(in_band & real_s, jnp.float32(1.0), 0.0)
    contrib4 = jnp.stack([r_s * w_s, g_s * w_s, b_s * w_s, w_s], axis=1)
    csum4 = jnp.cumsum(contrib4, axis=0)

    key = jnp.where(~real_s & ok_s, pix_s, jnp.int32(hw))
    rr, gg, bb, cc = place_rows_by_pixel(
        key, (csum4[:, 0], csum4[:, 1], csum4[:, 2], csum4[:, 3]), hw
    )

    def ddiff(x):
        return x - jnp.concatenate([jnp.zeros((1,), x.dtype), x[:-1]])

    sums = jax.lax.psum(
        jnp.stack([ddiff(rr), ddiff(gg), ddiff(bb)], axis=1), axis
    )
    cnt = jax.lax.psum(ddiff(cc), axis)

    # original-order residuals (pix, z) + the per-shard pixel-ownership
    # image; the backward re-derives band/head per point from the
    # replicated global z-buffer (ops/raster_diff.bwd_from_images)
    return (sums, cnt, global_min), (pix, zs, own_px)


def _fwd_shard_compact(pts, cols, pix, zs, zb, *, hw, depth_band, axis,
                       interp=False):
    """Carrier-free per-shard forward on the production machinery
    (ops/raster_pallas4 compact_rows_by_rank + float-sums expand_winners
    — the same kernels the single-device compact forward uses): the
    n-point sort replaces the (n + hw) carrier sort, and two lean
    compactions replace the two full-stream placement sorts. Values are
    bit-identical to the carrier path (both produce f32 csum diffs at
    segment ends; empty pixels read DEPTH_EMPTY from the expansion's
    FLT_MAX seed — the same bits the carriers carried)."""
    from rtnr_tpu.ops.raster import segment_broadcast_head
    from rtnr_tpu.ops.raster_pallas4 import (
        compact_rows_by_rank, expand_winners,
    )

    cf = cols.astype(jnp.float32)
    pix_s, zb_s, r_s, g_s, b_s = jax.lax.sort(
        (pix, zb, cf[:, 0], cf[:, 1], cf[:, 2]), num_keys=2, is_stable=False,
    )
    m = pix_s.shape[0]
    z_s = jax.lax.bitcast_convert_type(zb_s, jnp.float32)
    ok_s = pix_s < hw
    is_head = pix_s != _shift_right(pix_s, jnp.int32(-1))
    is_last = pix_s != _shift_left(pix_s, jnp.int32(-2))
    head_pos = jax.lax.cummax(
        jnp.where(is_head, jnp.arange(m, dtype=jnp.int32), jnp.int32(0))
    )
    zb_head = segment_broadcast_head(zb_s, is_head, head_pos)

    winner = is_last & ok_s
    wi = winner.astype(jnp.int32)
    rank_incl = jnp.cumsum(wi)
    rank_excl = rank_incl - wi
    slot = jnp.where(winner, rank_excl, jnp.int32(-1))
    total = rank_incl[-1]
    L = 16384
    starts = rank_excl[::L]
    bc = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)

    # pass A: per-shard z-buffer (head depth per pixel; count > 0 flags
    # occupancy so empties read the FLT_MAX seed)
    cs_n = jnp.cumsum(ok_s.astype(jnp.float32))
    csn_b = bc(cs_n)
    wimg_a = compact_rows_by_rank(
        slot, [csn_b, csn_b, csn_b, csn_b, zb_head, pix_s], total,
        part_size=L, part_starts=starts, interpret=interp,
    )
    _, _, local_min = expand_winners(
        wimg_a, total, hw, float_sums=True, interpret=interp,
    )
    global_min = jax.lax.pmin(local_min, axis)

    # depth-gradient ownership: lowest mesh rank among exact-depth ties
    rank = jax.lax.axis_index(axis).astype(jnp.int32)
    owner = jax.lax.pmin(
        jnp.where(local_min == global_min, rank, _I32_MAX), axis
    )
    own_px = (owner == rank).astype(jnp.int32)

    # band against the GLOBAL z-buffer (reference two-pass structure,
    # render.cu:101-106), gathered at the sorted pixel ids
    min_d_s = jnp.take(global_min, jnp.where(ok_s, pix_s, 0))
    min_d_s = jnp.where(ok_s, min_d_s, jnp.float32(jnp.inf))
    in_band = ok_s & ~(z_s > min_d_s + jnp.float32(depth_band))
    w_s = in_band.astype(jnp.float32)

    # pass B: banded color sums as f32 csum diffs at segment ends
    cs_r = jnp.cumsum(r_s * w_s)
    cs_g = jnp.cumsum(g_s * w_s)
    cs_b = jnp.cumsum(b_s * w_s)
    cs_c = jnp.cumsum(w_s)
    wimg_b = compact_rows_by_rank(
        slot, [bc(cs_r), bc(cs_g), bc(cs_b), bc(cs_c), zb_head, pix_s],
        total, part_size=L, part_starts=starts, interpret=interp,
    )
    sums3, cnt, _ = expand_winners(
        wimg_b, total, hw, float_sums=True, interpret=interp,
    )
    sums = jax.lax.psum(sums3, axis)
    cnt = jax.lax.psum(cnt, axis)
    return (sums, cnt, global_min), (pix, zs, own_px)


def _bwd_shard(pix, z, own, depth_img, pts, Mf, g_sums, g_depth, *,
               hw, depth_band, axis):
    """Per-shard backward: one multi-lane row gather at the shard's own
    pixel ids (ops/raster_diff.bwd_from_images, ownership-gated depth
    cotangent) → chain through the projection; camera partials psum over
    the mesh."""
    from rtnr_tpu.ops.raster_diff import bwd_from_images

    g_colors, gz = bwd_from_images(
        g_sums, g_depth, depth_img, pix, z, hw, depth_band, own=own
    )
    # z = p · M[2,:3] + M[2,3]
    g_points = gz[:, None] * Mf[2, :3][None, :]
    g_M = jnp.zeros((4, 4), jnp.float32).at[2, :3].set(gz @ pts).at[2, 3].set(
        jnp.sum(gz)
    )
    return g_points, g_colors, jax.lax.psum(g_M, axis)


def rasterize_diff_point_sharded(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
    depth_band: float = 0.02,
    points_axis: str = "points",
) -> DiffRaster:
    """Differentiable single-frame raster with the scene sharded over
    ``points_axis``. Same contract as ``rasterize_diff_sorted``; outputs are
    replicated, gradients land on the owning shard (points/colors) or are
    psum-merged (cam_proj)."""
    out = _diff_sharded(
        points, colors, cam_proj, mesh,
        width=width, height=height, valid=valid, depth_band=depth_band,
        points_axis=points_axis, batch_axis=None,
    )
    return out


def rasterize_diff_sharded_batch(
    points: jax.Array,
    colors: jax.Array,
    cam_projs: jax.Array,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
    depth_band: float = 0.02,
    points_axis: str = "points",
    batch_axis: str = "batch",
) -> DiffRaster:
    """Batched frames (cam_projs (F,4,4) sharded over ``batch_axis``) ×
    point shards; DiffRaster fields carry a leading frame axis."""
    return _diff_sharded(
        points, colors, cam_projs, mesh,
        width=width, height=height, valid=valid, depth_band=depth_band,
        points_axis=points_axis, batch_axis=batch_axis,
    )


def _diff_sharded(
    points, colors, cam_proj, mesh, *,
    width, height, valid, depth_band, points_axis, batch_axis,
):
    hw = width * height
    if valid is None:
        valid = jnp.ones((points.shape[0],), bool)

    spec_p = P(points_axis)
    spec_b = P() if batch_axis is None else P(batch_axis)
    spec_res = spec_p if batch_axis is None else P(batch_axis, points_axis)

    fwd_one = functools.partial(
        _fwd_shard, width=width, height=height, depth_band=depth_band,
        axis=points_axis,
    )
    bwd_one = functools.partial(
        _bwd_shard, hw=hw, depth_band=depth_band, axis=points_axis
    )

    if batch_axis is None:
        fwd_body = fwd_one

        def bwd_body(pix, z, own, depth_img, pts, Mf, g_sums, g_depth):
            return bwd_one(pix, z, own, depth_img, pts, Mf, g_sums, g_depth)
    else:
        def fwd_body(pts, cols, val, Ms):
            return jax.vmap(lambda M: fwd_one(pts, cols, val, M))(Ms)

        def bwd_body(pix, z, own, depth_img, pts, Mfs, g_sums, g_depth):
            gp, gc, gM = jax.vmap(
                lambda px, zz, ow, di, Mf, gs, gd: bwd_one(
                    px, zz, ow, di, pts, Mf, gs, gd
                )
            )(pix, z, own, depth_img, Mfs, g_sums, g_depth)
            # the same scene serves every frame: sum point/color grads over
            # local frames, then over the batch axis
            gp = jax.lax.psum(jnp.sum(gp, axis=0), batch_axis)
            gc = jax.lax.psum(jnp.sum(gc, axis=0), batch_axis)
            return gp, gc, gM

    fwd_sm = jax.shard_map(
        fwd_body, mesh=mesh,
        in_specs=(spec_p, spec_p, spec_p, spec_b),
        out_specs=((spec_b, spec_b, spec_b), (spec_res,) * 3),
        check_vma=False,
    )
    bwd_sm = jax.shard_map(
        bwd_body, mesh=mesh,
        in_specs=(spec_res,) * 3 + (spec_b, spec_p, spec_b, spec_b, spec_b),
        out_specs=(spec_p, spec_p, spec_b if batch_axis is not None else P()),
        check_vma=False,
    )

    @jax.custom_vjp
    def core(points, colors, cam_proj):
        out, _ = fwd_sm(points, colors, valid, cam_proj)
        return out

    def core_fwd(points, colors, cam_proj):
        out, res = fwd_sm(points, colors, valid, cam_proj)
        # out[2] is the replicated global z-buffer the backward gathers from
        return out, (res, out[2], points, cam_proj.astype(jnp.float32))

    def core_bwd(resid, cts):
        (pix, z, own), depth_img, pts, Mf = resid
        g_sums, _g_cnt, g_depth = cts
        g_points, g_colors, g_M = bwd_sm(
            pix, z, own, depth_img, pts, Mf, g_sums, g_depth
        )
        return g_points, g_colors, g_M.astype(cam_proj.dtype)

    core.defvjp(core_fwd, core_bwd)

    sums, cnt, depth = core(points, colors, cam_proj)
    occupied = cnt > 0
    rgb = jnp.where(occupied[..., None], sums / jnp.maximum(cnt, 1.0)[..., None], 0.0)
    lead = () if batch_axis is None else (cam_proj.shape[0],)
    return DiffRaster(
        rgb=rgb.reshape(*lead, height, width, 3),
        depth=depth.reshape(*lead, height, width),
        count=cnt.astype(jnp.int32).reshape(*lead, height, width),
        mask=occupied.reshape(*lead, height, width),
    )
