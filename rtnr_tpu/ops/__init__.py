from rtnr_tpu.ops.raster import (
    depth_min_max,
    project_points,
    project_and_sort,
    raster_images,
    rasterize,
    rasterize_scatter,
    resolve_uint8,
)
from rtnr_tpu.ops.raster_diff import rasterize_diff, rasterize_diff_sorted
from rtnr_tpu.ops.prefilter import depth_prefilter
from rtnr_tpu.ops.culling import build_block_index, cull_points, compact_points

__all__ = [
    "depth_min_max",
    "project_points",
    "project_and_sort",
    "raster_images",
    "rasterize",
    "rasterize_scatter",
    "rasterize_diff",
    "rasterize_diff_sorted",
    "resolve_uint8",
    "depth_prefilter",
    "build_block_index",
    "cull_points",
    "compact_points",
]
