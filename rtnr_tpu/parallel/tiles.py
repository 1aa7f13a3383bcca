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
    sp = project_and_sort(pts, cols, M, width=width, height=strip_h, valid=val)
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
