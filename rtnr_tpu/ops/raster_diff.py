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
