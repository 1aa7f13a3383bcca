"""Determinism: identical outputs across runs and across shardings.

SURVEY.md section 5 — on TPU, XLA determinism replaces the reference's
(nonexistent) race-detection story; the concurrency-critical reductions
(z-buffer min merge, color-sum merge) must produce identical bits however
the work is partitioned.
"""

import numpy as np

import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import rasterize
from rtnr_tpu.parallel import make_mesh, rasterize_point_sharded
from rtnr_tpu.parallel.tiles import rasterize_tile_sharded
from rtnr_tpu.scene import Scene


def test_identical_across_runs_and_shardings():
    scene = Scene.synthetic(25_000, seed=0, extent=8.0)
    cam = Camera.from_params(60, 60, 32, 32, 64, 64)
    E = np.eye(4)
    E[2, 3] = 10.0
    pts, cols, valid = scene.sorted_by_block().device_arrays(8 * 8)
    args = (jnp.asarray(pts), jnp.asarray(cols))
    M = jnp.asarray(cam.cam_proj(E), jnp.float32)
    v = jnp.asarray(valid)

    runs = [
        np.asarray(rasterize(*args, M, width=64, height=64, valid=v)[0]) for _ in range(3)
    ]
    assert all((r == runs[0]).all() for r in runs[1:])

    shardings = [
        rasterize_point_sharded(*args, v, M, make_mesh((1, 8)), width=64, height=64),
        rasterize_tile_sharded(*args, v, M, make_mesh((8,), ("tiles",)), width=64, height=64)[:2],
        rasterize_tile_sharded(
            *args, v, M, make_mesh((4, 2), ("tiles", "points")),
            width=64, height=64, points_axis="points",
        )[:2],
    ]
    for rgb, depth in shardings:
        np.testing.assert_array_equal(np.asarray(rgb), runs[0])
