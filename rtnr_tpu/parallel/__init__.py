from rtnr_tpu.parallel.mesh import make_mesh
from rtnr_tpu.parallel.render import (
    rasterize_point_sharded,
    render_filtered_sharded,
    render_full_batch,
)

__all__ = [
    "make_mesh",
    "rasterize_point_sharded",
    "render_filtered_sharded",
    "render_full_batch",
]
