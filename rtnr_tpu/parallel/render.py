"""Multi-device rendering: point sharding + frame batching.

The reference renders one frame at a time on one GPU with every point
resident locally (project_cloud.cu:321-323 brute-forces all points per
frame). Here the scene is sharded over a ``"points"`` mesh axis: each chip
rasters its shard into a full-resolution partial z-buffer, partial depth
images merge with ``pmin`` over ICI, the 2 cm accumulation band is then
evaluated against the *global* minimum (preserving the reference's two-pass
semantics, render.cu:53-130), and partial color sums merge with ``psum``.
Frames batch over a ``"batch"`` axis as pure data parallelism.

shard_map is used narrowly — only around the raster, which needs explicit
collectives. Prefilter + U-Net run outside under plain jit with sharding
constraints, letting XLA partition the convs over the batch axis itself.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtnr_tpu.models.unet import UNet
from rtnr_tpu.ops.prefilter import depth_prefilter
from rtnr_tpu.ops.raster import (
    accumulate_sums,
    min_depth_image,
    project_and_sort,
    resolve_uint8,
)
from rtnr_tpu.pipeline import pad_to_pyramid


def _raster_shard_fn(
    pts: jax.Array,
    cols: jax.Array,
    val: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    depth_band: float,
    axis: str,
) -> Tuple[jax.Array, jax.Array]:
    """Per-device body: local sort-raster + cross-shard merge.

    Returns replicated (sums4 (HW,4) int32, global min depth (HW,) f32).
    """
    hw = width * height
    sp = project_and_sort(pts, cols, cam_proj, width=width, height=height, valid=val)
    local_min = min_depth_image(sp, hw)
    # z-buffer merge across point shards (ICI collective; the reference's
    # atomicMin has no cross-device analog — this is it).
    global_min = jax.lax.pmin(local_min, axis)
    # Band test against the global minimum (two-pass order preserved).
    sums4 = accumulate_sums(sp, global_min, hw, depth_band)
    sums4 = jax.lax.psum(sums4, axis)
    return sums4, global_min


def rasterize_point_sharded(
    points: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    cam_proj: jax.Array,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    depth_band: float = 0.02,
    points_axis: str = "points",
) -> Tuple[jax.Array, jax.Array]:
    """Single-frame raster with the scene sharded over ``points_axis``.

    points (N,3) with N divisible by the axis size. Returns
    (rgb (H,W,3) uint8, depth (H,W) f32), replicated.
    """
    other_axes = tuple(n for n in mesh.axis_names if n != points_axis)
    spec_pts = P(points_axis)
    fn = jax.shard_map(
        functools.partial(
            _raster_shard_fn,
            width=width,
            height=height,
            depth_band=depth_band,
            axis=points_axis,
        ),
        mesh=mesh,
        in_specs=(spec_pts, spec_pts, spec_pts, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    sums4, depth = fn(points, colors, valid, cam_proj)
    rgb = resolve_uint8(sums4[:, :3], sums4[:, 3])
    return rgb.reshape(height, width, 3), depth.reshape(height, width)


def _batched_raster(
    points, colors, valid, cam_projs, mesh, *, width, height, depth_band,
    points_axis, batch_axis,
):
    """(F,4,4) camera batch -> per-frame sums + depth, frames sharded over
    ``batch_axis`` and points over ``points_axis``."""

    def body(pts, cols, val, Ms):
        # Ms: (F_local, 4, 4); vmap the local raster over frames.
        def one(M):
            return _raster_shard_fn(
                pts, cols, val, M,
                width=width, height=height, depth_band=depth_band, axis=points_axis,
            )

        return jax.vmap(one)(Ms)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(points_axis), P(points_axis), P(points_axis), P(batch_axis)),
        out_specs=(P(batch_axis), P(batch_axis)),
        check_vma=False,
    )
    sums4, depth = fn(points, colors, valid, cam_projs)
    return sums4, depth  # (F, HW, 4), (F, HW)


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "width", "height", "depth_band", "levels",
                     "filter_strength", "gradient_filter", "points_axis", "batch_axis"),
)
def render_filtered_sharded(
    points, colors, valid, cam_projs, mesh, *,
    width: int, height: int, depth_band: float = 0.02, levels: int = 4,
    filter_strength: float = 1.025, gradient_filter: float = 0.03,
    points_axis: str = "points", batch_axis: str = "batch",
) -> Dict[str, jax.Array]:
    """Batched frames -> raster (sharded) + prefilter (batch-parallel).

    cam_projs: (F, 4, 4). Returns per-frame rgb/depth/unet_input, sharded
    over the batch axis.
    """
    sums4, depth = _batched_raster(
        points, colors, valid, cam_projs, mesh,
        width=width, height=height, depth_band=depth_band,
        points_axis=points_axis, batch_axis=batch_axis,
    )
    f = cam_projs.shape[0]
    rgb = jax.vmap(resolve_uint8)(sums4[:, :, :3], sums4[:, :, 3])
    rgb = rgb.reshape(f, height, width, 3)
    depth = depth.reshape(f, height, width)

    spec = NamedSharding(mesh, P(batch_axis))
    rgb = jax.lax.with_sharding_constraint(rgb, spec)
    depth = jax.lax.with_sharding_constraint(depth, spec)

    def one_filter(d, c):
        dp, cp = pad_to_pyramid(d, c, levels)
        return depth_prefilter(
            dp, cp, levels=levels, filter_strength=filter_strength,
            gradient_filter=gradient_filter,
        )

    out = jax.vmap(one_filter)(depth, rgb)
    return {
        "raw_rgb": rgb,
        "raw_depth": depth,
        "rgb": out["filtered_rgb"][:, :height, :width],
        "depth": out["filtered_depth"][:, :height, :width],
        "mask": out["mask"][:, :height, :width],
        "unet_input": out["unet_input"],
    }


def render_full_batch(
    points, colors, valid, cam_projs, mesh, unet: UNet, unet_variables: Any, *,
    width: int, height: int, depth_band: float = 0.02, levels: int = 4,
    filter_strength: float = 1.025, gradient_filter: float = 0.03,
    points_axis: str = "points", batch_axis: str = "batch",
) -> Dict[str, jax.Array]:
    """Full neural render of a frame batch across the mesh.

    U-Net parameters stay replicated; activations shard over the batch axis.
    """
    mid = render_filtered_sharded(
        points, colors, valid, cam_projs, mesh,
        width=width, height=height, depth_band=depth_band, levels=levels,
        filter_strength=filter_strength, gradient_filter=gradient_filter,
        points_axis=points_axis, batch_axis=batch_axis,
    )
    x = mid["unet_input"]  # (F, H', W', 5)
    x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(batch_axis)))

    # Fast batched inference (VERDICT r2 item 6): when the packed
    # phase-planar path is eligible (TPU, bf16, folded BN, pyramid-padded
    # shape — models/unet.py phase_input_ok), run the U-Net under shard_map
    # over the batch axis and apply the phase path per local frame. Each
    # single-frame apply routes through the Pallas phase kernels (1.7x
    # faster than the XLA convs at 1080p); parameters stay replicated.
    import os

    from rtnr_tpu.models.unet import phase_input_ok

    force = os.environ.get("RTNR_SPLIT_FORCE") == "1"
    f_total = x.shape[0]
    n_batch_dev = mesh.shape[batch_axis]
    use_phase = (
        phase_input_ok(unet, x.shape[1], x.shape[2], force=force)
        and f_total % n_batch_dev == 0
    )
    if use_phase:
        def apply_local(vars_, x_local):
            ys = [unet.apply(vars_, x_local[i : i + 1]) for i in range(x_local.shape[0])]
            return jnp.concatenate(ys, axis=0)

        y = jax.shard_map(
            apply_local, mesh=mesh,
            in_specs=(P(), P(batch_axis)),
            out_specs=P(batch_axis),
            check_vma=False,
        )(unet_variables, x)
    else:
        y = unet.apply(unet_variables, x)
    y = y.astype(jnp.float32)[:, :height, :width]
    rgb8 = jnp.clip(jnp.rint(y * 255.0), 0, 255).astype(jnp.uint8)
    return {**mid, "rgb_f": y, "rgb_unet": rgb8}
