"""Render configuration.

The reference hard-compiles its heuristic constants as CUDA ``__constant__``
globals (reference project_cloud.cu:20-26) and ships a dead ``Config`` class
(reference include/Config.h). Here they are a real, serializable dataclass
threaded through the jitted pipeline as static configuration.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static configuration for the render pipeline.

    Defaults reproduce the reference semantics exactly:
    - ``depth_band``: accumulation tolerance band above the per-pixel min
      depth (reference render.cu:106, ``min_depth + 0.02f``).
    - ``pyramid_levels``: number of min-pyramid halvings in the depth
      prefilter (reference project_cloud.cu:23, ``depthRescaleDepth = 4``).
    - ``filter_strength``: coarse-vs-fine depth keep ratio (reference
      project_cloud.cu:24, ``filterStrength = 1.025``).
    - ``gradient_filter``: Laplacian edge threshold (reference
      project_cloud.cu:25, ``gradientFilter = 0.03``).
    - ``block_size_m``: voxel block edge for the scene grid (reference
      cloudreader.cpp:10, ``block_size = 0.25f``).
    """

    depth_band: float = 0.02
    pyramid_levels: int = 4
    filter_strength: float = 1.025
    gradient_filter: float = 0.03
    block_size_m: float = 0.25

    # Numerical stance for the U-Net. "bf16" is the TPU-native default;
    # "f32" is used for parity testing against the fp32 oracle.
    unet_dtype: str = "bf16"

    # int8 inference for the packed phase-planar U-Net path (v5e MXU int8
    # is 2x bf16 peak): "off" (exact bf16), "dyn" (in-kernel per-lane
    # activation quant, deep levels only), "static" (calibrated per-layer
    # scales + int8 activations in HBM — fastest; the Renderer calibrates
    # on the first rendered frame). Approximate (~1-3% relative); the
    # reference's own shipped inference is precision-degraded fp16
    # TensorRT (model/export_ts.py:16).
    unet_int8: str = "off"

    # Per-stage wall-time reporting (the reference's per-frame RENDER_TIME
    # print, project_cloud.cu:490): runs projection / prefilter / U-Net as
    # three synchronized device programs instead of one fused executable.
    # Costs fusion, so it is a diagnostics mode, not the deployment path.
    stage_timing: bool = False

    # U-Net feature widths (reference model/model.py:23 defaults).
    unet_features: Tuple[int, ...] = (64, 128, 256, 512)
    unet_in_channels: int = 5
    unet_out_channels: int = 3

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    @classmethod
    def from_json(cls, s: str) -> "RenderConfig":
        d = json.loads(s)
        d["unet_features"] = tuple(d.get("unet_features", (64, 128, 256, 512)))
        return cls(**d)


# Sentinel float bits used to seed the z-buffer: 0x7F7FFFFF == FLT_MAX
# (reference project_cloud.cu:316 / render.cu:166). Any pixel still holding
# this value after projection is "empty".
DEPTH_EMPTY = 3.4028234663852886e38  # float32 FLT_MAX

# The prefilter treats any depth >= this as empty (reference
# project_cloud.cu:21, ``MAX_FLOAT 3.4028e38`` — note: slightly below
# FLT_MAX on purpose, matching the reference's constant).
DEPTH_EMPTY_THRESHOLD = 3.4028e38
