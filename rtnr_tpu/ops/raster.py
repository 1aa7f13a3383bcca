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

TPU-first redesign (NOT a translation). TPUs have neither global atomics
nor gather/scatter hardware — measured on v5e, a 5M-element ``jnp.take`` or
``.at[].set`` runs ~100 ns/element (serialized), while ``jax.lax.sort`` of
5-7M int32 elements runs in tens of milliseconds. So the raster uses sorts
for *everything*, including writing the dense images:

1. **Carrier augmentation**: one sentinel entry per output pixel (depth =
   FLT_MAX bits, color 0) joins the point stream, guaranteeing every pixel
   a nonempty segment — empty-pixel defaults fall out of the same math.
2. **Sort 1** over (pixel id, depth bits): integer-only lexicographic sort
   (depth as its f32 bit pattern — the reference's own atomicMin-on-bits
   ordering trick, render.cu:72-81); colors + realness pack into one lane.
3. Segment logic is scan/shift only: head depth broadcasts by a segmented
   Hillis-Steele scan; the 2 cm band admits a *prefix* of each segment
   (depth ascends), closed by cumulative-sum differences against the head's
   prefix — no index gathers anywhere.
4. **Sort 2 (placement)**: exactly one "winner" element per pixel carries
   the finished (sums, count, depth) row; sorting winners by pixel id and
   slicing the first H*W rows *is* the dense image — scatter-free image
   materialization.

Everything is shape-static and jit/vmap/shard_map friendly. The same
primitive decomposes for multi-chip rendering: per-shard min-depth images
merge with `pmin`, per-shard partial sums with `psum`
(see rtnr_tpu/parallel).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from rtnr_tpu.config import DEPTH_EMPTY

_INT32_MAX = jnp.iinfo(jnp.int32).max
_REAL_BIT = 1 << 24  # realness flag packed above the 3x8bit color lanes


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


class SortedPoints(NamedTuple):
    """Point+carrier stream sorted by (pixel id, depth) + segment metadata.

    With carriers (the default), every pixel in [0, H*W) owns a nonempty
    segment whose trailing element is its carrier (depth FLT_MAX, color 0,
    not real). Culled points sort to the sentinel tail segment.
    """

    pix: jax.Array  # (M,) int32, sorted; sentinel H*W for culled points
    z: jax.Array  # (M,) f32, ascending within a pixel segment
    rgb: jax.Array  # (M, 3) int32 (0 for carriers)
    ok: jax.Array  # (M,) bool — pix < H*W
    is_real: jax.Array  # (M,) bool — actual point, not a carrier
    is_head: jax.Array  # (M,) bool — first element of its pixel segment
    is_last: jax.Array  # (M,) bool — last element of its pixel segment
    head_pos: jax.Array  # (M,) int32 — index of the segment head


def project_and_sort(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
    carriers: bool = True,
    depth_key: bool = True,
    row_offset: Optional[jax.Array] = None,
) -> SortedPoints:
    """Project points and sort (with per-pixel carriers) by (pixel, depth).

    ``depth_key=False`` sorts by pixel id ONLY (one key instead of two —
    measured 5.35 vs 8.74 ms marginal at 5M elements on v5e,
    scripts/profile_sort3.py): elements of a pixel segment arrive in
    arbitrary depth order. Only valid for consumers that are order-free
    within a segment (ops/raster_pallas5.py, which computes the segment min
    with a scan instead of taking the head) — the carrier path and v1-v4
    kernels require the depth-sorted invariant.

    ``row_offset`` renders the row band [row_offset, row_offset + height)
    of the FULL image: v is rounded with the full-image matrix first and
    the offset subtracted as an integer, so each point's pixel row is
    BIT-IDENTICAL to the full-image render — baking the shift into the
    projection matrix instead changes f32 rounding near .5 boundaries
    (parallel/tiles.py strip sharding)."""
    hw = width * height
    u, v, z = project_points(points, cam_proj.astype(jnp.float32))
    if row_offset is not None:
        v = v - jnp.asarray(row_offset, jnp.int32)
    pix, ok = _pixel_ids(u, v, z, valid, width, height)
    zs = jnp.where(ok, z, jnp.float32(jnp.inf))

    # Integer-only sort: depth as its float bit pattern (order-preserving
    # for positive values), colors + realness packed into one lane.
    z_bits = jax.lax.bitcast_convert_type(zs, jnp.int32)
    cols = colors.astype(jnp.int32)
    packed = cols[:, 0] | (cols[:, 1] << 8) | (cols[:, 2] << 16) | jnp.int32(_REAL_BIT)

    if carriers:
        carrier_pix = jnp.arange(hw, dtype=jnp.int32)
        carrier_z = jnp.full((hw,), jnp.float32(DEPTH_EMPTY))
        pix = jnp.concatenate([pix, carrier_pix])
        z_bits = jnp.concatenate(
            [z_bits, jax.lax.bitcast_convert_type(carrier_z, jnp.int32)]
        )
        packed = jnp.concatenate([packed, jnp.zeros((hw,), jnp.int32)])

    # unstable: equal (pixel, depth-bits) elements are interchangeable in all
    # downstream segment math (sums/count/min are commutative; winner picks
    # by key only) — measured 16.9 -> 12.1 ms at 5M elements on v5e
    pix_s, zb_s, packed_s = jax.lax.sort(
        (pix, z_bits, packed), num_keys=2 if depth_key else 1, is_stable=False
    )
    z_s = jax.lax.bitcast_convert_type(zb_s, jnp.float32)
    rgb_s = jnp.stack(
        [packed_s & 255, (packed_s >> 8) & 255, (packed_s >> 16) & 255], axis=1
    )

    m = pix_s.shape[0]
    ok_s = pix_s < hw
    idx = jnp.arange(m, dtype=jnp.int32)
    is_head = pix_s != _shift_right(pix_s, jnp.int32(-1))
    is_last = pix_s != _shift_left(pix_s, jnp.int32(-2))
    head_pos = jax.lax.cummax(jnp.where(is_head, idx, jnp.int32(0)))
    return SortedPoints(
        pix=pix_s,
        z=z_s,
        rgb=rgb_s,
        ok=ok_s,
        is_real=(packed_s & _REAL_BIT) != 0,
        is_head=is_head,
        is_last=is_last,
        head_pos=head_pos,
    )


def segment_broadcast_head(
    values: jax.Array, is_head: jax.Array, head_pos: Optional[jax.Array] = None
) -> jax.Array:
    """Propagate each segment head's value (1D or rows of a 2D array) to all
    segment elements.

    Gather-free: Hillis-Steele segmented doubling, log2(N) fused elementwise
    steps. With ``head_pos`` (index of each element's segment head — one
    cheap cummax, usually already computed) the per-step "found" flag
    becomes the static predicate ``idx - head_pos < 2^k``, halving scan
    traffic. Invariant per step k: v[i] holds the original value at
    ``max(head_pos[i], i - 2^k + 1)``.
    """
    n = values.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    if head_pos is None:
        head_pos = jax.lax.cummax(jnp.where(is_head, idx, jnp.int32(0)))
    dist = idx - head_pos
    v = values
    shift = 1
    while shift < n:
        at_head = dist < shift
        sel = at_head if v.ndim == 1 else at_head[:, None]
        v_prev = jnp.concatenate([v[:shift], v[:-shift]], axis=0)
        v = jnp.where(sel, v, v_prev)
        shift *= 2
    return v


def _shift_rows_right(x: jax.Array) -> jax.Array:
    """Row i -> row i-1's value; row 0 -> zeros. (2D, axis 0.)"""
    return jnp.concatenate([jnp.zeros((1, x.shape[1]), x.dtype), x[:-1]], axis=0)


def place_rows_by_pixel(
    key: jax.Array, rows: Tuple[jax.Array, ...], hw: int
) -> Tuple[jax.Array, ...]:
    """Scatter-free dense-image materialization: sort rows by pixel key and
    take the first H*W — valid when exactly one row per pixel carries a key
    < H*W (carriers guarantee this). Non-winner rows carry key >= H*W."""
    out = jax.lax.sort((key,) + tuple(rows), num_keys=1, is_stable=False)
    return tuple(o[:hw] for o in out[1:])


def band_winners(sp: SortedPoints, depth_band: float):
    """Per-element band logic + the per-segment winner ("band end") carrying
    the finished pixel row. Returns (band_end mask, sums4 rows (M,4) int32,
    head-depth bits (M,) int32)."""
    z_head = segment_broadcast_head(sp.z, sp.is_head, sp.head_pos)
    # Band (reference render.cu:106): keep iff NOT (depth > min + 0.02f);
    # carriers carry FLT_MAX and are only in-band when they head an empty
    # pixel (FLT_MAX + 0.02f == FLT_MAX in f32).
    in_band = sp.ok & ~(sp.z > z_head + jnp.float32(depth_band))
    next_in = jnp.concatenate([in_band[1:], jnp.array([False])])
    band_end = in_band & (sp.is_last | ~next_in)

    real = sp.is_real.astype(jnp.int32)
    contrib4 = jnp.concatenate([sp.rgb * real[:, None], real[:, None]], axis=1)
    csum4 = jnp.cumsum(contrib4, axis=0, dtype=jnp.int32)
    prev4 = _shift_rows_right(csum4)
    z_bits = jax.lax.bitcast_convert_type(sp.z, jnp.int32)
    # One fused 5-lane broadcast from segment heads: the head's preceding
    # prefix sums + the head's own depth bits.
    head_info = segment_broadcast_head(
        jnp.concatenate([prev4, z_bits[:, None]], axis=1), sp.is_head, sp.head_pos
    )
    sums4 = csum4 - head_info[:, :4]  # at band_end: in-band prefix totals
    return band_end, sums4, head_info[:, 4]


def raster_images(
    sp: SortedPoints, hw: int, depth_band: float
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dense (sums (HW,3) int32, count (HW,) int32, depth (HW,) f32) via the
    placement sort. Requires carriers in ``sp``."""
    band_end, sums4, zhead_bits = band_winners(sp, depth_band)
    key = jnp.where(band_end, sp.pix, jnp.int32(hw))
    r, g, b, cnt, zb = place_rows_by_pixel(
        key, (sums4[:, 0], sums4[:, 1], sums4[:, 2], sums4[:, 3], zhead_bits), hw
    )
    sums = jnp.stack([r, g, b], axis=1)
    depth = jax.lax.bitcast_convert_type(zb, jnp.float32)
    return sums, cnt, depth


def min_depth_image(sp: SortedPoints, hw: int) -> jax.Array:
    """(HW,) min-depth image (FLT_MAX empty) via placement sort.

    The head of each pixel segment holds its minimum depth (carriers supply
    the FLT_MAX default for empty pixels) — the TPU replacement for the
    reference's atomicMin z-buffer (render.cu:81)."""
    key = jnp.where(sp.is_head & (sp.pix < hw), sp.pix, jnp.int32(hw))
    z_bits = jax.lax.bitcast_convert_type(sp.z, jnp.int32)
    (zb,) = place_rows_by_pixel(key, (z_bits,), hw)
    return jax.lax.bitcast_convert_type(zb, jnp.float32)


def gather_images_sorted(
    imgs: Tuple[jax.Array, ...], pix_s: jax.Array, hw: int
) -> Tuple[jax.Array, ...]:
    """Gather-free ``img[pix_s]`` over several same-shape images for *sorted*
    pixel ids, via ONE sort-merge.

    Interleaves one carrier per pixel (holding that pixel's image values)
    with the id stream, sorts by (pixel, carrier-first), scan-broadcasts the
    carrier values across each segment, then un-sorts by original rank with
    another placement sort. Only sorts + scans — no scatter/gather
    primitives. All image lanes ride the same two sorts.
    """
    n = pix_s.shape[0]

    def to_bits(img):
        return (
            jax.lax.bitcast_convert_type(img, jnp.int32)
            if img.dtype == jnp.float32
            else img.astype(jnp.int32)
        )

    keys1 = jnp.concatenate([jnp.arange(hw, dtype=jnp.int32), pix_s])
    keys2 = jnp.concatenate([jnp.zeros((hw,), jnp.int32), jnp.ones((n,), jnp.int32)])
    payloads = tuple(
        jnp.concatenate([to_bits(img), jnp.zeros((n,), jnp.int32)]) for img in imgs
    )
    rank = jnp.concatenate(
        [jnp.full((hw,), n, jnp.int32), jnp.arange(n, dtype=jnp.int32)]
    )
    out = jax.lax.sort((keys1, keys2) + payloads + (rank,), num_keys=2, is_stable=False)
    k1, pays, rk = out[0], out[2:-1], out[-1]
    is_head = k1 != _shift_right(k1, jnp.int32(-1))  # carriers sort first
    vals = segment_broadcast_head(jnp.stack(pays, axis=1), is_head)
    # un-sort: placement by original rank; carriers (rank n) drop off the end
    unsorted = jax.lax.sort(
        (rk,) + tuple(vals[:, i] for i in range(len(imgs))), num_keys=1,
        is_stable=False,
    )[1:]
    result = []
    for img, lane in zip(imgs, unsorted):
        lane = lane[:n]
        if img.dtype == jnp.float32:
            result.append(jax.lax.bitcast_convert_type(lane, jnp.float32))
        else:
            result.append(lane.astype(img.dtype))
    return tuple(result)


def gather_image_sorted(img: jax.Array, pix_s: jax.Array, hw: int) -> jax.Array:
    """Single-image ``gather_images_sorted`` (see above)."""
    return gather_images_sorted((img,), pix_s, hw)[0]


def accumulate_sums(
    sp: SortedPoints, min_depth: Optional[jax.Array], hw: int, depth_band: float
) -> jax.Array:
    """Band-filtered per-pixel color sums + counts -> (HW, 4) int32.

    ``min_depth=None`` tests the band against the local segment-head depth
    (single-chip path); otherwise against the supplied (e.g. globally
    pmin-merged) image — matching the reference's two-pass structure where
    accumulation reads the *final* z-buffer (render.cu:101-106). Either way
    the band admits a *prefix* of each locally-sorted segment (every local
    depth >= its pixel's global min), closed by cumsum differences.
    """
    if min_depth is None:
        sums, cnt, _ = raster_images(sp, hw, depth_band)
        return jnp.concatenate([sums, cnt[:, None]], axis=1)

    min_d = gather_image_sorted(min_depth, sp.pix, hw)
    in_band = sp.ok & ~(sp.z > min_d + jnp.float32(depth_band))
    next_in = jnp.concatenate([in_band[1:], jnp.array([False])])
    band_end = in_band & (sp.is_last | ~next_in)
    # Exactly-one-winner per pixel per shard: if the whole local segment is
    # out of the *global* band (its head isn't in band — in-band is a
    # prefix), no band_end fires; the carrier (segment tail, zero
    # contribution) wins instead so the placement slice stays aligned and
    # psum merges a zero row from this shard.
    carrier = ~sp.is_real & sp.ok
    head_in_band = segment_broadcast_head(in_band, sp.is_head, sp.head_pos)
    winner = band_end | (carrier & ~head_in_band)

    w = (in_band & sp.is_real).astype(jnp.int32)
    contrib4 = jnp.concatenate([sp.rgb * w[:, None], w[:, None]], axis=1)
    csum4 = jnp.cumsum(contrib4, axis=0, dtype=jnp.int32)
    prev4 = _shift_rows_right(csum4)
    head_prev4 = segment_broadcast_head(prev4, sp.is_head, sp.head_pos)
    sums4 = csum4 - head_prev4

    key = jnp.where(winner, sp.pix, jnp.int32(hw))
    r, g, b, cnt = place_rows_by_pixel(
        key, (sums4[:, 0], sums4[:, 1], sums4[:, 2], sums4[:, 3]), hw
    )
    return jnp.stack([r, g, b, cnt], axis=1)


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
    import os

    # v4 (depth-keyed sort, csum-diff winners) is the measured default; v5
    # (pixel-only sort + segmented-min winners) measured within noise of it
    # at the bench shape (scripts/profile_raster5.py) and is kept as a foil
    resolve = os.environ.get("RTNR_RESOLVE", "v4")
    on_tpu = jax.default_backend() == "tpu"
    big = points.shape[0] + hw >= (1 << 17)
    if on_tpu and big and resolve == "v5":
        # pixel-only single-key sort (no depth key, no carriers): the
        # winners kernel computes segment mins with a scan instead
        from rtnr_tpu.ops.raster_pallas5 import raster_images_pallas5

        sp = project_and_sort(points, colors, cam_proj, width=width,
                              height=height, valid=valid, carriers=False,
                              depth_key=False)
        return raster_images_pallas5(sp, hw, depth_band)
    if on_tpu and big and resolve == "v4":
        # carrier-free: skips sorting H*W carrier elements entirely
        from rtnr_tpu.ops.raster_pallas4 import raster_images_pallas4

        sp = project_and_sort(points, colors, cam_proj, width=width,
                              height=height, valid=valid, carriers=False)
        return raster_images_pallas4(sp, hw, depth_band)
    sp = project_and_sort(points, colors, cam_proj, width=width, height=height, valid=valid)
    if sp.pix.shape[0] >= (1 << 17):
        if on_tpu:
            if resolve == "v3" or resolve == "v4":
                from rtnr_tpu.ops.raster_pallas3 import raster_images_pallas3

                return raster_images_pallas3(sp, hw, depth_band)
            from rtnr_tpu.ops.raster_pallas2 import raster_images_pallas2

            return raster_images_pallas2(sp, hw, depth_band)
        from rtnr_tpu.ops.raster_partitioned import raster_images_partitioned

        return raster_images_partitioned(sp, hw, depth_band)
    return raster_images(sp, hw, depth_band)


def resolve_uint8(sum_img: jax.Array, cnt_img: jax.Array) -> jax.Array:
    """Integer-average resolve (reference render.cu:145-162)."""
    cnt = jnp.maximum(cnt_img, 1)[:, None]
    rgb = (sum_img // cnt).astype(jnp.uint8)
    return jnp.where(cnt_img[:, None] > 0, rgb, jnp.uint8(0))


@functools.partial(jax.jit, static_argnames=("width", "height", "depth_band"))
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


@functools.partial(jax.jit, static_argnames=("width", "height", "depth_band"))
def rasterize_packed(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
    depth_band: float = 0.02,
) -> Tuple[jax.Array, jax.Array]:
    """As ``rasterize`` but returns rgb packed r|g<<8|b<<16 as (H, W) i32 —
    the phase prefilter consumes the packed form directly, skipping an
    unpack/repack round trip over the frame."""
    import os

    hw = width * height
    resolve = os.environ.get("RTNR_RESOLVE", "v4")
    on_tpu = jax.default_backend() == "tpu"
    big = points.shape[0] + hw >= (1 << 17)
    if on_tpu and big and resolve == "v4":
        # fused in-kernel resolve: the expansion emits packed rgb + depth
        # directly, skipping ~1.9 ms of dense-image XLA glue (hlo_stats r3)
        from rtnr_tpu.ops.raster_pallas4 import raster_images_pallas4

        sp = project_and_sort(points, colors, cam_proj, width=width,
                              height=height, valid=valid, carriers=False)
        packed, depth_img = raster_images_pallas4(
            sp, hw, depth_band, packed_out=True
        )
        return packed.reshape(height, width), depth_img.reshape(height, width)
    sum_img, cnt_img, depth_img = _raster_sums(
        points, colors, cam_proj, width=width, height=height, valid=valid,
        depth_band=depth_band,
    )
    cnt = jnp.maximum(cnt_img, 1)[:, None]
    rgb = jnp.where(cnt_img[:, None] > 0, sum_img // cnt, 0)
    packed = rgb[:, 0] | (rgb[:, 1] << 8) | (rgb[:, 2] << 16)
    return packed.reshape(height, width), depth_img.reshape(height, width)


def unpack_rgb8(packed: jax.Array) -> jax.Array:
    """(..., ) i32 r|g<<8|b<<16 -> (..., 3) uint8."""
    return jnp.stack(
        [((packed >> s) & 255).astype(jnp.uint8) for s in (0, 8, 16)], axis=-1
    )


@functools.partial(jax.jit, static_argnames=("width", "height", "depth_band"))
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
    benchmark foil for the sort-based version (XLA lowers large scatters to
    ~per-element serial loops on TPU, so this is far slower at scale).
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
