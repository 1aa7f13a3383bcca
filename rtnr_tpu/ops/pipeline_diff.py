"""Differentiable end-to-end path: raster -> prefilter -> (U-Net).

BASELINE.json config 4 ("differentiable raster + U-Net fine-tune with
pose-gradient check"): gradients flow from a pixel loss back through the
packed 5-channel tensor to point colors, point positions, and the camera
matrix — and onward to U-Net parameters when the net is applied on top.

Differentiability facts (see ops/raster_diff.py for the raster's):
- the prefilter's masks (pyramid compares, Laplacian edges) are boolean —
  naturally piecewise-constant, treated straight-through;
- the kept pixels' depth channel (z - dmin)/(dmax - dmin) is smooth in the
  surviving depths (dmin/dmax subgradients via jnp.min/max);
- color channels are linear in the in-band point colors.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from rtnr_tpu.ops.prefilter import depth_prefilter
from rtnr_tpu.ops.raster_diff import rasterize_diff, rasterize_diff_sorted
from rtnr_tpu.pipeline import pad_to_pyramid


@functools.partial(
    jax.jit, static_argnames=("width", "height", "depth_band", "levels")
)
def render_filtered_diff(
    points: jax.Array,
    colors: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    valid: Optional[jax.Array] = None,
    depth_band: float = 0.02,
    levels: int = 4,
    filter_strength: float = 1.025,
    gradient_filter: float = 0.03,
) -> Dict[str, jax.Array]:
    """Differentiable raster + prefilter.

    colors: (N,3) float32 (0..255). Returns the padded ``unet_input``
    (H',W',5) plus the float rgb/depth — all differentiable w.r.t.
    points / colors / cam_proj along the smooth paths.
    """
    # scale dispatch mirroring ops/raster._raster_sums: the scatter-based
    # formulation serializes on TPU beyond ~1e5 elements; the sort-based
    # custom-VJP variant has the production forward's cost shape
    raster = (
        rasterize_diff_sorted
        if points.shape[0] + width * height >= (1 << 17)
        else rasterize_diff
    )
    out = raster(
        points, colors, cam_proj, width=width, height=height, valid=valid,
        depth_band=depth_band,
    )
    # float rgb (0..255) quantization-free; prefilter packing divides by 255
    dpad, cpad = pad_to_pyramid(out.depth, out.rgb, levels)
    pf = depth_prefilter(
        dpad, cpad, levels=levels, filter_strength=filter_strength,
        gradient_filter=gradient_filter,
    )
    return {
        "unet_input": pf["unet_input"],
        "rgb_f": out.rgb,
        "depth": out.depth,
        "mask": pf["mask"][:height, :width],
        "depth_min": pf["depth_min"],
        "depth_max": pf["depth_max"],
    }


def render_full_diff(
    points, colors, cam_proj, unet, unet_variables, *,
    width: int, height: int, valid=None, depth_band: float = 0.02,
    levels: int = 4,
) -> jax.Array:
    """Differentiable full pipeline -> float RGB (H,W,3) in ~[0,1].

    Gradients reach point colors/positions, the camera matrix, AND the
    U-Net parameters in one backward pass.
    """
    mid = render_filtered_diff(
        points, colors, cam_proj, width=width, height=height, valid=valid,
        depth_band=depth_band, levels=levels,
    )
    y = unet.apply(unet_variables, mid["unet_input"][None])[0]
    return y.astype(jnp.float32)[:height, :width]
