"""Frustum culling on the voxel block grid.

The reference builds its 0.25 m block grid but never culls with it — the
renderer brute-forces every point every frame (SURVEY.md section 2,
"spatial structure ... never used for culling"). Here the grid earns its
keep: per-frame, each block's AABB is tested against the view frustum and
points of invisible blocks are masked out (or compacted into a fixed-size
budget buffer), shrinking the dominant per-frame sort.

Everything is static-shape: block tests are a (B, 8)-corner projection
(tiny), and point-level visibility is a gather of the per-block bit.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtnr_tpu.scene import Scene


class BlockIndex(NamedTuple):
    """Static per-scene block table for on-device culling."""

    corners: jax.Array  # (B, 8, 3) f32 block AABB corners
    corner_signs: jax.Array  # (B, 8, 3) f32 +-1 outward direction per corner
    point_block: jax.Array  # (N,) int32 index into the block table per point


def build_block_index(scene: Scene, pad_to_multiple: int = 8) -> BlockIndex:
    """Precompute block corner table + per-point block slot (host side)."""
    s = scene.sorted_by_block()
    uniq, inv = np.unique(s.block_keys, return_inverse=True)
    lo, hi = s.block_bounds(uniq)
    # all 8 corners: choose min/max per axis
    B = uniq.shape[0]
    corners = np.empty((B, 8, 3), np.float32)
    signs = np.empty((B, 8, 3), np.float32)
    for c in range(8):
        sel = [(c >> a) & 1 for a in range(3)]
        corners[:, c, 0] = np.where(sel[0], hi[:, 0], lo[:, 0])
        corners[:, c, 1] = np.where(sel[1], hi[:, 1], lo[:, 1])
        corners[:, c, 2] = np.where(sel[2], hi[:, 2], lo[:, 2])
        signs[:, c, 0] = 1.0 if sel[0] else -1.0
        signs[:, c, 1] = 1.0 if sel[1] else -1.0
        signs[:, c, 2] = 1.0 if sel[2] else -1.0

    n = s.n_points
    n_pad = (-n) % pad_to_multiple
    point_block = np.concatenate([inv.astype(np.int32), np.full(n_pad, 0, np.int32)])
    return BlockIndex(
        corners=jnp.asarray(corners),
        corner_signs=jnp.asarray(signs),
        point_block=jnp.asarray(point_block),
    )


def visible_blocks(
    corners: jax.Array, cam_proj: jax.Array, width: int, height: int, margin: float = 1.0
) -> jax.Array:
    """(B,) bool — block potentially intersects the view frustum.

    A block is visible unless all 8 corners are behind the camera, or all
    are beyond one image border (conservative separating-plane test in
    projective space; ``margin`` in pixels absorbs splat rounding).
    """
    M = cam_proj.astype(jnp.float32)
    r = corners @ M[:3, :3].T + M[:3, 3]  # (B, 8, 3)
    x, y, z = r[..., 0], r[..., 1], r[..., 2]
    eps = jnp.float32(1e-9)

    all_behind = jnp.all(z <= 0.0, axis=1)
    # For corners in front, compare x against z-scaled borders; corners
    # behind the camera invalidate border separation (conservative).
    front = z > 0.0
    lo_x = x < (0.0 - margin) * z - eps
    hi_x = x > (jnp.float32(width - 1) + margin) * z + eps
    lo_y = y < (0.0 - margin) * z - eps
    hi_y = y > (jnp.float32(height - 1) + margin) * z + eps

    def sep(cond):
        return jnp.all(cond & front, axis=1)

    separated = sep(lo_x) | sep(hi_x) | sep(lo_y) | sep(hi_y)
    return ~(all_behind | separated)


@functools.partial(jax.jit, static_argnames=("width", "height"))
def cull_points(
    index: BlockIndex,
    cam_proj: jax.Array,
    valid: jax.Array,
    *,
    width: int,
    height: int,
    margin: float = 1.0,
    inflate_m: float = 0.0,
) -> jax.Array:
    """Per-point visibility mask for this frame (AND with scene validity).

    ``inflate_m`` grows every block AABB outward by that many meters before
    the frustum test: any camera whose center moves <= inflate_m from this
    pose still sees only blocks from the inflated visible set, so a culled
    compaction can be CACHED and reused across nearby frames (the policy
    pipeline.Renderer implements). ``margin`` (pixels) similarly absorbs
    small rotations and splat rounding.
    """
    corners = index.corners + jnp.float32(inflate_m) * index.corner_signs
    vis = visible_blocks(corners, cam_proj, width, height, margin=margin)
    return valid & jnp.take(vis, index.point_block)


@functools.partial(jax.jit, static_argnames=("budget",))
def compact_points(
    points: jax.Array,
    colors: jax.Array,
    keep: jax.Array,
    budget: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Gather kept points into a fixed-size buffer (static shape ``budget``).

    Overflowing points beyond the budget are dropped (callers size the
    budget from the scene's worst expected visibility); unused slots are
    marked invalid. This is what makes culling actually shrink the
    per-frame sort under jit's static shapes.

    TPU-native compaction: a placement SORT by destination slot (kept
    points get their cumsum rank, dropped points the sentinel), then the
    first ``budget`` rows — scatters serialize on TPU (~100 ns/element,
    see ops/raster.py), one 5-lane sort does not.
    """
    n = points.shape[0]
    slots = jnp.where(keep, jnp.cumsum(keep.astype(jnp.int32)) - 1, n)
    slots = jnp.where(slots < budget, slots, n)  # overflow -> dropped
    packed_col = (
        colors[:, 0].astype(jnp.int32)
        | (colors[:, 1].astype(jnp.int32) << 8)
        | (colors[:, 2].astype(jnp.int32) << 16)
    )
    _, x_s, y_s, z_s, c_s = jax.lax.sort(
        (slots, points[:, 0], points[:, 1], points[:, 2], packed_col), num_keys=1,
        is_stable=False,
    )
    out_pts = jnp.stack([x_s[:budget], y_s[:budget], z_s[:budget]], axis=1)
    out_cols = jnp.stack(
        [c_s[:budget] & 255, (c_s[:budget] >> 8) & 255, (c_s[:budget] >> 16) & 255],
        axis=1,
    ).astype(colors.dtype)
    n_kept = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), budget)
    out_valid = jnp.arange(budget) < n_kept
    return out_pts, out_cols, out_valid
