"""Frustum culling correctness: culled render == uncalled render."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.culling import (
    build_block_index,
    compact_points,
    cull_points,
    visible_blocks,
)
from rtnr_tpu.ops.raster import rasterize
from rtnr_tpu.scene import Scene


@pytest.fixture(scope="module")
def setup():
    # points spread widely so many blocks fall outside a narrow frustum
    scene = Scene.synthetic(30_000, seed=0, extent=40.0)
    cam = Camera.from_params(100, 100, 32, 32, 64, 64)
    E = np.eye(4)
    E[2, 3] = 25.0
    pts, cols, valid = scene.sorted_by_block().device_arrays(8)
    M = jnp.asarray(cam.cam_proj(E), jnp.float32)
    return scene, cam, pts, cols, valid, M


def test_visible_blocks_conservative(setup):
    scene, cam, pts, cols, valid, M = setup
    idx = build_block_index(scene, pad_to_multiple=8)
    vis = visible_blocks(idx.corners, M, cam.width, cam.height)
    # narrow frustum over a wide scene: a solid fraction must be culled
    frac = float(np.mean(np.asarray(vis)))
    assert frac < 0.9
    assert frac > 0.0


def test_culled_render_identical(setup):
    scene, cam, pts, cols, valid, M = setup
    idx = build_block_index(scene, pad_to_multiple=8)
    keep = cull_points(idx, M, jnp.asarray(valid), width=cam.width, height=cam.height)
    base_rgb, base_d = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), M, width=cam.width, height=cam.height,
        valid=jnp.asarray(valid),
    )
    cull_rgb, cull_d = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), M, width=cam.width, height=cam.height,
        valid=keep,
    )
    np.testing.assert_array_equal(np.asarray(base_d), np.asarray(cull_d))
    np.testing.assert_array_equal(np.asarray(base_rgb), np.asarray(cull_rgb))


def test_compacted_render_identical(setup):
    scene, cam, pts, cols, valid, M = setup
    idx = build_block_index(scene, pad_to_multiple=8)
    keep = cull_points(idx, M, jnp.asarray(valid), width=cam.width, height=cam.height)
    n_keep = int(np.asarray(keep).sum())
    budget = ((n_keep + 1023) // 1024) * 1024
    cpts, ccols, cvalid = compact_points(jnp.asarray(pts), jnp.asarray(cols), keep, budget)
    base_rgb, base_d = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), M, width=cam.width, height=cam.height,
        valid=jnp.asarray(valid),
    )
    got_rgb, got_d = rasterize(
        cpts, ccols, M, width=cam.width, height=cam.height, valid=cvalid
    )
    np.testing.assert_array_equal(np.asarray(base_d), np.asarray(got_d))
    np.testing.assert_array_equal(np.asarray(base_rgb), np.asarray(got_rgb))


def test_compact_overflow_drops(setup):
    scene, cam, pts, cols, valid, M = setup
    keep = jnp.asarray(valid)
    cpts, ccols, cvalid = compact_points(jnp.asarray(pts), jnp.asarray(cols), keep, 100)
    assert int(cvalid.sum()) == 100  # clipped at budget
