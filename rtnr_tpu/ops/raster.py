"""Point-splat rasterization with z-buffer — TPU-native sort-based design.

Semantics reproduced from the reference CUDA kernels
(src/RTRenderer/src/render.cu):

- Projection: ``r = M @ [p, 1]`` with M = K4 @ E; cull ``r.z <= 0``
  (render.cu:63); pixel = round-half-even of (x/z, y/z) (render.cu:65-66,
  ``rintf``); cull out-of-frame (render.cu:68).
- ``minDepthPass`` (render.cu:53-83): per-pixel minimum depth via
  warp-cooperative atomicMin on float-as-uint bits. Buffer seeded with
  0x7F7FFFFF == FLT_MAX (project_cloud.cu:316).
- ``accumulatePass`` (render.cu:85-130): every point whose depth lies within
  ``min_depth + 0.02`` of the per-pixel minimum contributes its RGB to a
  per-pixel integer sum + count via atomicAdd.
- ``resolvePass`` (render.cu:132-163): RGB = integer-division sum/count;
  black where count == 0.

TPU-first redesign (NOT a translation): TPUs have no global atomics and XLA
serializes scattered conflicts, so the atomic z-buffer becomes a **sort-based
segment reduction**:

1. compute per-point pixel ids,
2. lexicographic sort by (pixel id, depth) — one `jax.lax.sort` with
   num_keys=2, the only O(N log N) step and XLA's sort is highly tuned,
3. per-pixel min depth = depth at each segment head (sorted ascending),
4. the 2 cm accumulation band is evaluated against the segment-head depth,
5. per-segment color sums via cumulative-sum differences,
6. one scatter **with unique indices** per image (segment heads for the
   depth map, segment tails for the color sums) — unique-index scatters
   need no conflict resolution and lower to fast code on TPU.

Everything is shape-static and jit/vmap/shard_map friendly. The same
primitive decomposes for multi-chip rendering: per-shard head-scatters merge
with `pmin`, per-shard partial sums with `psum` (see rtnr_tpu/parallel).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtnr_tpu.config import DEPTH_EMPTY

_INT32_MAX = jnp.iinfo(jnp.int32).max


def project_points(
    points: jax.Array, cam_proj: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Project world points to pixel coordinates + camera depth.

    points: (N, 3) float32; cam_proj: (4, 4) float32 (K4 @ world-to-cam).
    Returns (u, v, z): u, v int32 pixel coords (round-half-even like
    ``rintf``, reference render.cu:65-66), z float32 camera depth.

    The reference's 4x4 ``matmul`` ignores the input w and adds the fourth
    column (render.cu:33-40, w=1 homogeneous); only rows 0..2 are consumed.
    """
    r = points @ cam_proj[:3, :3].T + cam_proj[:3, 3]
    z = r[:, 2]
    safe_z = jnp.where(z > 0.0, z, 1.0)  # avoid inf/nan on culled points
    u = jnp.rint(r[:, 0] / safe_z).astype(jnp.int32)
    v = jnp.rint(r[:, 1] / safe_z).astype(jnp.int32)
    return u, v, z


def _pixel_ids(
    u: jax.Array, v: jax.Array, z: jax.Array, valid: Optional[jax.Array], width: int, height: int
) -> Tuple[jax.Array, jax.Array]:
    """Linear pixel id per point; invalid points get sentinel id H*W."""
    ok = (z > 0.0) & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    if valid is not None:
        ok = ok & valid
    sentinel = jnp.int32(width * height)
    pix = jnp.where(ok, v * width + u, sentinel)
    return pix, ok


def _shift_right(x: jax.Array, fill) -> jax.Array:
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


def _shift_left(x: jax.Array, fill) -> jax.Array:
    return jnp.concatenate([x[1:], jnp.full((1,), fill, x.dtype)])


@functools.partial(jax.jit, static_argnames=("width", "height"))
def rasterize(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
    depth_band: float = 0.02,
) -> Tuple[jax.Array, jax.Array]:
    """Full splat raster: returns (rgb (H,W,3) uint8, depth (H,W) f32).

    Empty pixels: rgb = 0, depth = FLT_MAX (matching the seeded z-buffer of
    reference project_cloud.cu:316). Color averaging uses integer division
    (truncation), matching reference render.cu:160-162.
    """
    sum_img, cnt_img, depth_img = _raster_sums(
        points, colors, cam_proj, width=width, height=height, valid=valid, depth_band=depth_band
    )
    rgb = resolve_uint8(sum_img, cnt_img)
    return rgb.reshape(height, width, 3), depth_img.reshape(height, width)


def resolve_uint8(sum_img: jax.Array, cnt_img: jax.Array) -> jax.Array:
    """Integer-average resolve (reference render.cu:145-162)."""
    cnt = jnp.maximum(cnt_img, 1)[:, None]
    rgb = (sum_img // cnt).astype(jnp.uint8)
    return jnp.where(cnt_img[:, None] > 0, rgb, jnp.uint8(0))


class SortedPoints(NamedTuple):
    """Points sorted by (pixel id, depth) + segment metadata.

    The reusable intermediate of the sort-based raster: the single-chip path
    consumes it directly; the sharded path computes it per point shard, merges
    head depths with `pmin`, then reuses it for the partial-sum pass.
    """

    pix: jax.Array  # (N,) int32, sorted; sentinel H*W for culled points
    z: jax.Array  # (N,) f32, ascending within a pixel segment
    rgb: jax.Array  # (N, 3) int32
    ok: jax.Array  # (N,) bool — pix < H*W
    is_head: jax.Array  # (N,) bool — first point of its pixel segment
    is_last: jax.Array  # (N,) bool — last point of its pixel segment
    head_pos: jax.Array  # (N,) int32 — index of the segment head


def project_and_sort(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
) -> SortedPoints:
    """Project points and sort by (pixel id, depth)."""
    n = points.shape[0]
    hw = width * height
    u, v, z = project_points(points, cam_proj.astype(jnp.float32))
    pix, ok = _pixel_ids(u, v, z, valid, width, height)
    zs = jnp.where(ok, z, jnp.float32(jnp.inf))

    cols = colors.astype(jnp.int32)
    pix_s, z_s, r_s, g_s, b_s = jax.lax.sort(
        (pix, zs, cols[:, 0], cols[:, 1], cols[:, 2]), num_keys=2
    )
    ok_s = pix_s < hw
    idx = jnp.arange(n, dtype=jnp.int32)
    is_head = pix_s != _shift_right(pix_s, jnp.int32(-1))
    is_last = pix_s != _shift_left(pix_s, jnp.int32(-2))
    head_pos = jax.lax.cummax(jnp.where(is_head, idx, jnp.int32(0)))
    return SortedPoints(
        pix=pix_s,
        z=z_s,
        rgb=jnp.stack([r_s, g_s, b_s], axis=1),
        ok=ok_s,
        is_head=is_head,
        is_last=is_last,
        head_pos=head_pos,
    )


def min_depth_image(sp: SortedPoints, hw: int) -> jax.Array:
    """Scatter segment-head depths -> (HW,) min-depth image (FLT_MAX empty).

    Segment heads have unique pixel ids, so this is a conflict-free scatter
    (the TPU replacement for the reference's atomicMin, render.cu:81).
    """
    head_ids = jnp.where(sp.ok & sp.is_head, sp.pix, jnp.int32(hw))
    return (
        jnp.full((hw,), DEPTH_EMPTY, jnp.float32)
        .at[head_ids]
        .set(sp.z, mode="drop", unique_indices=True)
    )


def accumulate_sums(
    sp: SortedPoints, min_depth: Optional[jax.Array], hw: int, depth_band: float
) -> jax.Array:
    """Band-filtered per-pixel color sums + counts -> (HW, 4) int32.

    ``min_depth=None`` uses the local segment-head depth (single-chip path);
    otherwise band membership is tested against the supplied (e.g. globally
    pmin-merged) min-depth image — matching the reference's two-pass
    structure where accumulation reads the *final* z-buffer
    (render.cu:101-106).
    """
    if min_depth is None:
        min_d = jnp.take(sp.z, sp.head_pos)
    else:
        min_d = jnp.take(min_depth, jnp.minimum(sp.pix, hw - 1))
    # Band (reference render.cu:106): keep iff NOT (depth > min + 0.02f).
    in_band = sp.ok & ~(sp.z > min_d + jnp.float32(depth_band))

    w = in_band.astype(jnp.int32)
    contrib = jnp.concatenate([sp.rgb * w[:, None], w[:, None]], axis=1)  # (N, 4)
    csum = jnp.cumsum(contrib, axis=0)
    prev = jnp.where(
        (sp.head_pos > 0)[:, None],
        jnp.take(csum, jnp.maximum(sp.head_pos - 1, 0), axis=0),
        0,
    )
    seg_total = csum - prev  # at segment-last positions: full segment sum

    last_ids = jnp.where(sp.ok & sp.is_last, sp.pix, jnp.int32(hw))
    return (
        jnp.zeros((hw, 4), jnp.int32)
        .at[last_ids]
        .set(seg_total, mode="drop", unique_indices=True)
    )


def _raster_sums(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array],
    depth_band: float,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Sort-based core: per-pixel (color sums int32 (HW,3), count int32 (HW,),
    min-depth f32 (HW,))."""
    hw = width * height
    sp = project_and_sort(points, colors, cam_proj, width=width, height=height, valid=valid)
    depth_img = min_depth_image(sp, hw)
    sums4 = accumulate_sums(sp, None, hw, depth_band)
    return sums4[:, :3], sums4[:, 3], depth_img


@functools.partial(jax.jit, static_argnames=("width", "height"))
def rasterize_scatter(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
    depth_band: float = 0.02,
) -> Tuple[jax.Array, jax.Array]:
    """Naive scatter-min/scatter-add raster (same semantics as `rasterize`).

    A direct XLA `.at[].min` / `.at[].add` formulation — the straightforward
    mapping of the CUDA atomics. Kept as an on-device cross-check and a
    benchmark foil for the sort-based version (XLA serializes conflicting
    scatters, so this is usually slower at scale).
    """
    hw = width * height
    u, v, z = project_points(points, cam_proj.astype(jnp.float32))
    pix, ok = _pixel_ids(u, v, z, valid, width, height)

    depth_img = (
        jnp.full((hw,), DEPTH_EMPTY, jnp.float32).at[pix].min(
            jnp.where(ok, z, jnp.float32(jnp.inf)), mode="drop"
        )
    )
    min_d = jnp.take(depth_img, jnp.minimum(pix, hw - 1))
    in_band = ok & ~(z > min_d + jnp.float32(depth_band))
    w = in_band.astype(jnp.int32)
    contrib = jnp.concatenate(
        [colors.astype(jnp.int32) * w[:, None], w[:, None]], axis=1
    )
    sums4 = jnp.zeros((hw, 4), jnp.int32).at[jnp.where(ok, pix, hw)].add(
        contrib, mode="drop"
    )
    rgb = resolve_uint8(sums4[:, :3], sums4[:, 3])
    return rgb.reshape(height, width, 3), depth_img.reshape(height, width)


def depth_min_max(depth_img: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Global (min, max) over non-empty depth pixels.

    Mirrors reference find_local/overall_minmax kernels (render.cu:166-240):
    the exact FLT_MAX sentinel (IGNORED_VALUE bits 0x7f7fffff) is skipped.
    Returns (inf, -inf) when every pixel is empty.
    """
    occupied = depth_img != jnp.float32(DEPTH_EMPTY)
    dmin = jnp.min(jnp.where(occupied, depth_img, jnp.inf))
    dmax = jnp.max(jnp.where(occupied, depth_img, -jnp.inf))
    return dmin, dmax
