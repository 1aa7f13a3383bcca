from rtnr_tpu.ops.raster import project_points, rasterize, rasterize_scatter
from rtnr_tpu.ops.prefilter import depth_prefilter

__all__ = [
    "project_points",
    "rasterize",
    "rasterize_scatter",
    "depth_prefilter",
]
