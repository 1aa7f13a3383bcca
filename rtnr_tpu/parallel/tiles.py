"""Output-tile sharding: image row-strips over a mesh axis.

The second scale-out axis from SURVEY.md section 2's parallelism plan
("output-tile sharding (~TP over pixels)"): each device owns a horizontal
strip of the image and rasters only points landing in it. Combines with
point sharding — per (tile, point-shard) device: strip raster -> ``pmin``
depth merge over the points axis -> band accumulate -> ``psum`` color
merge -> strips ``all_gather``'d over the tiles axis into full frames.

A strip is rendered with a shifted camera: row range [t*hl, (t+1)*hl)
maps to a strip-local projection M' with row 1 replaced by
``M[1] - t*hl * M[2]`` (v' = (y - t*hl*z)/z), so the whole existing raster
stack applies unchanged at (W x hl).

Why strips beat a replicated full-res raster: the dominant per-frame costs
(placement sorts and carrier streams) scale with the pixel count, which
drops by the tile count — and out-of-strip points cull before the sort.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from rtnr_tpu.ops.prefilter import depth_prefilter
from rtnr_tpu.ops.raster import (
    accumulate_sums,
    min_depth_image,
    project_and_sort,
    resolve_uint8,
)


def strip_projection(cam_proj: jax.Array, t: jax.Array, strip_h: int) -> jax.Array:
    """Shift the projection so strip t's rows map to [0, strip_h)."""
    shift = t.astype(jnp.float32) * jnp.float32(strip_h)
    return cam_proj.at[1, :].add(-shift * cam_proj[2, :])


def _tile_shard_fn(
    pts, cols, val, cam_proj, corners, corner_signs, point_block, *,
    width, strip_h, depth_band, tiles_axis, points_axis, tile_budget
):
    t = jax.lax.axis_index(tiles_axis)
    M = strip_projection(cam_proj, t, strip_h)
    hw = width * strip_h
    n_candidates = jnp.sum(val.astype(jnp.int32))
    if corners is not None:
        # per-strip candidate gather (SURVEY.md §2 parallelism row 2): only
        # points whose 0.25 m block intersects THIS strip's frustum enter
        # the strip's sort. The strip projection is a normal pinhole matrix
        # at (width x strip_h), so the whole-frame block test applies as-is.
        from rtnr_tpu.ops.culling import BlockIndex, compact_points, cull_points

        index = BlockIndex(corners=corners, corner_signs=corner_signs,
                           point_block=point_block)
        keep = cull_points(index, M, val, width=width, height=strip_h)
        n_candidates = jnp.sum(keep.astype(jnp.int32))
        pts, cols, val = compact_points(pts, cols, keep, tile_budget)
    # project with the FULL-image matrix + integer row offset: baking the
    # strip shift into the matrix changes f32 rounding near .5 row
    # boundaries (1-pixel strip-vs-full differences); the offset form is
    # bit-identical to the single-device raster (ops/raster.py)
    sp = project_and_sort(pts, cols, cam_proj, width=width, height=strip_h,
                          valid=val, row_offset=t * jnp.int32(strip_h))
    if points_axis is not None:
        local_min = min_depth_image(sp, hw)
        gmin = jax.lax.pmin(local_min, points_axis)
        sums4 = accumulate_sums(sp, gmin, hw, depth_band)
        sums4 = jax.lax.psum(sums4, points_axis)
        depth = gmin
    else:
        from rtnr_tpu.ops.raster import raster_images

        sums, cnt, depth = raster_images(sp, hw, depth_band)
        sums4 = jnp.concatenate([sums, cnt[:, None]], axis=1)
    rgb = resolve_uint8(sums4[:, :3], sums4[:, 3])
    return (
        rgb.reshape(strip_h, width, 3),
        depth.reshape(strip_h, width),
        n_candidates[None],
    )


def rasterize_tile_sharded(
    points: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    cam_proj: jax.Array,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    depth_band: float = 0.02,
    tiles_axis: str = "tiles",
    points_axis: Optional[str] = None,
    block_index=None,
    tile_budget: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Single-frame raster with the image sharded into row strips (and the
    points optionally sharded on a second axis).

    With ``block_index`` (ops.culling.BlockIndex) + ``tile_budget``, each
    strip first gathers only the points whose block intersects its frustum
    (compacted to the budget), so the per-strip sort covers the strip's
    candidates instead of the whole cloud.

    Returns full (rgb (H,W,3) uint8, depth (H,W) f32, candidates (n_tiles,)
    i32), replicated — strips concatenate via the all_gather implied by the
    out_specs; ``candidates[t]`` is how many points entered strip t's raster.
    """
    n_tiles = mesh.shape[tiles_axis]
    assert height % n_tiles == 0, f"height {height} must divide into {n_tiles} strips"
    strip_h = height // n_tiles
    if block_index is not None and tile_budget is None:
        tile_budget = points.shape[0]

    pts_spec = P(points_axis) if points_axis else P()
    corners = block_index.corners if block_index is not None else None
    signs = block_index.corner_signs if block_index is not None else None
    pblock = block_index.point_block if block_index is not None else None
    fn = jax.shard_map(
        functools.partial(
            _tile_shard_fn,
            width=width,
            strip_h=strip_h,
            depth_band=depth_band,
            tiles_axis=tiles_axis,
            points_axis=points_axis,
            tile_budget=tile_budget,
        ),
        mesh=mesh,
        in_specs=(pts_spec, pts_spec, pts_spec, P(), P(), P(), pts_spec),
        out_specs=(P(tiles_axis), P(tiles_axis), P(tiles_axis)),
        check_vma=False,
    )
    rgb_strips, depth_strips, cand = fn(
        points, colors, valid, cam_proj, corners, signs, pblock
    )
    return (
        rgb_strips.reshape(height, width, 3),
        depth_strips.reshape(height, width),
        cand,
    )


def render_full_tile_sharded(
    points: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    cam_proj: jax.Array,
    mesh: Mesh,
    unet,
    unet_variables,
    *,
    width: int,
    height: int,  # must already be pyramid-padded AND divide into strips
    depth_band: float = 0.02,
    levels: int = 4,
    filter_strength: float = 1.025,
    gradient_filter: float = 0.03,
    halo: int = 96,
    unet_halo: int = 32,
    tiles_axis: str = "tiles",
    points_axis: Optional[str] = None,
) -> Dict[str, jax.Array]:
    """FULL pipeline (raster -> prefilter -> U-Net) with the image sharded
    into row strips over ``tiles_axis`` (optionally x point shards).

    - Raster: per-strip (exact; strips partition the image).
    - Prefilter: each strip ``ppermute``s ``halo`` boundary rows of its
      depth/rgb to its neighbors and runs the strip-mode prefilter
      (ops/prefilter.py row_offset/total_h), which reproduces full-image
      border semantics at global rows — core rows are BIT-exact vs the
      single-device pipeline. ``halo`` must exceed the border-pollution
      bound sum(2^(l+1), l=1..levels) (60 rows at levels=4) and keep
      pyramid alignment (multiples of 2^levels).
    - U-Net: per-strip apply on the core plus ``unet_halo`` overlap rows
      (discarded after), so seams deviate only by the receptive-field tail
      beyond ``unet_halo`` — allclose, not bit-exact (the documented
      tile-sharded inference trade; exact strips would need the full ~140
      row receptive field as overlap).

    Constraints: height % (n_tiles * 2^levels) == 0, halo % 2^levels == 0,
    unet_halo % 2^levels == 0, halo >= pollution bound + unet_halo.

    Reference analog: the single-GPU full pipeline project_cloud.cu:437-493;
    tiling is the SURVEY §2 output-tile scale-out axis applied to ALL three
    stages instead of the raster alone.
    """
    n_tiles = mesh.shape[tiles_axis]
    lv = 1 << levels
    pad_w = -(-width // lv) * lv
    assert height % (n_tiles * lv) == 0, (
        f"height {height} must divide into {n_tiles} pyramid-aligned strips"
    )
    strip_h = height // n_tiles
    assert halo % lv == 0 and unet_halo % lv == 0
    pollution = sum(2 ** (l + 1) for l in range(1, levels + 1))
    assert halo >= pollution + unet_halo, (
        f"halo {halo} < pollution bound {pollution} + unet_halo {unet_halo}"
    )
    ext_h = strip_h + 2 * halo
    assert ext_h % lv == 0
    assert halo <= strip_h, (
        f"halo {halo} > strip height {strip_h}: the one-hop ppermute "
        "exchange cannot reach rows two strips away"
    )

    pts_spec = P(points_axis) if points_axis else P()

    def body(pts, cols, val, M, uvars):
        t = jax.lax.axis_index(tiles_axis)
        hw = width * strip_h
        # full-image matrix + integer row offset: bit-identical rounding
        # vs the single-device raster (see rasterize_tile_sharded)
        sp = project_and_sort(pts, cols, M, width=width, height=strip_h,
                              valid=val, row_offset=t * jnp.int32(strip_h))
        if points_axis is not None:
            local_min = min_depth_image(sp, hw)
            gmin = jax.lax.pmin(local_min, points_axis)
            sums4 = jax.lax.psum(
                accumulate_sums(sp, gmin, hw, depth_band), points_axis
            )
            depth = gmin
        else:
            from rtnr_tpu.ops.raster import raster_images

            sums, cnt, depth = raster_images(sp, hw, depth_band)
            sums4 = jnp.concatenate([sums, cnt[:, None]], axis=1)
        rgb = resolve_uint8(sums4[:, :3], sums4[:, 3])
        rgb = rgb.reshape(strip_h, width, 3)
        depth = depth.reshape(strip_h, width)
        if pad_w > width:
            # pyramid column padding with empty pixels (pad_to_pyramid
            # semantics): the raster ran at the TRUE width, so padded
            # columns never receive real splats
            from rtnr_tpu.config import DEPTH_EMPTY as _DE

            depth = jnp.pad(depth, ((0, 0), (0, pad_w - width)),
                            constant_values=_DE)
            rgb = jnp.pad(rgb, ((0, 0), (0, pad_w - width), (0, 0)))

        # ---- halo exchange over ICI: neighbors' boundary rows ----
        def ring(x, shift):
            # shift=+1: receive from t-1 (their data moves down the ring)
            perm = [((i - shift) % n_tiles, i) for i in range(n_tiles)]
            return jax.lax.ppermute(x, tiles_axis, perm)

        top = ring(jnp.concatenate([depth[-halo:][None], 
                                    rgb[-halo:].astype(jnp.float32).transpose(2, 0, 1)], 0), 1)
        bot = ring(jnp.concatenate([depth[:halo][None],
                                    rgb[:halo].astype(jnp.float32).transpose(2, 0, 1)], 0), -1)
        from rtnr_tpu.config import DEPTH_EMPTY

        # first/last strips: the ring wraps — overwrite the nonexistent
        # outer halos with filler; strip-mode border masks guarantee those
        # values are never consumed for global rows in [0, height)
        top = jnp.where(t == 0, jnp.full_like(top, DEPTH_EMPTY), top)
        bot = jnp.where(t == n_tiles - 1, jnp.full_like(bot, DEPTH_EMPTY), bot)
        ext_depth = jnp.concatenate([top[0], depth, bot[0]], axis=0)
        ext_rgb = jnp.concatenate(
            [top[1:4].transpose(1, 2, 0), rgb.astype(jnp.float32),
             bot[1:4].transpose(1, 2, 0)], axis=0,
        ).astype(jnp.uint8)

        # global depth range for the normalization channel
        from rtnr_tpu.ops.raster import depth_min_max

        dmin_l, dmax_l = depth_min_max(depth.reshape(-1))
        dmin = jax.lax.pmin(dmin_l, tiles_axis)
        dmax = jax.lax.pmax(dmax_l, tiles_axis)
        if points_axis is not None:
            # already identical across point shards (computed post-merge)
            pass

        pf = depth_prefilter(
            ext_depth, ext_rgb, levels=levels,
            filter_strength=filter_strength, gradient_filter=gradient_filter,
            row_offset=t * strip_h - halo, total_h=height,
            minmax=(dmin, dmax),
        )
        x_core = pf["unet_input"][halo : halo + strip_h]
        uh = unet_halo
        x_ext = pf["unet_input"][halo - uh : halo + strip_h + uh]
        # zero the overlap rows beyond the global image (first/last strips)
        grow = jnp.arange(x_ext.shape[0])[:, None, None] + (t * strip_h - uh)
        x_ext = jnp.where((grow >= 0) & (grow < height), x_ext, 0.0)
        y = unet.apply(uvars, x_ext[None])[0]
        y_core = y[uh : uh + strip_h].astype(jnp.float32)
        return (
            rgb, depth, x_core,
            y_core,
        )

    fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(pts_spec, pts_spec, pts_spec, P(), P()),
        out_specs=(P(tiles_axis), P(tiles_axis), P(tiles_axis), P(tiles_axis)),
        check_vma=False,
    )
    rgb, depth, x, y = fn(points, colors, valid, cam_proj, unet_variables)
    rgb = rgb.reshape(height, width, 3)
    depth = depth.reshape(height, width)
    x = x.reshape(height, pad_w, 5)[:, :width]
    y = y.reshape(height, pad_w, 3)[:, :width]
    rgb8 = jnp.clip(jnp.rint(y * 255.0), 0, 255).astype(jnp.uint8)
    return {
        "raw_rgb": rgb,
        "raw_depth": depth,
        "unet_input": x,
        "rgb_f": y,
        "rgb_unet": rgb8,
    }
