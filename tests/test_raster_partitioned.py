"""Partitioned raster resolve: bit-exact vs the monolithic path at several
(part count, part size) shapes, including cross-part segments and bands."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import project_and_sort, raster_images
from rtnr_tpu.ops.raster_partitioned import raster_images_partitioned


def make_sp(n, w, h, seed=0, z_range=(2.0, 8.0), extent=4.0, dense=False):
    rng = np.random.default_rng(seed)
    if dense:
        # many points per pixel: long segments spanning part boundaries
        px = rng.integers(0, w, n)
        py = rng.integers(0, h // 4, n)  # concentrate rows
        z = rng.uniform(*z_range, n)
        pts = np.stack([(px - w / 2) * z / 40.0, (py - h / 2) * z / 40.0, z], 1)
    else:
        pts = np.stack(
            [rng.uniform(-extent, extent, n), rng.uniform(-extent, extent, n),
             rng.uniform(*z_range, n)], 1
        )
    pts = pts.astype(np.float32)
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    cam = Camera.from_params(40.0, 40.0, w / 2, h / 2, w, h)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    return project_and_sort(
        jnp.asarray(pts), jnp.asarray(cols), M, width=w, height=h
    ), w * h


@pytest.mark.parametrize("part_size", [256, 1024, 4096])
@pytest.mark.parametrize("dense", [False, True])
def test_partitioned_matches_monolithic(part_size, dense):
    sp, hw = make_sp(20000, 64, 48, seed=1, dense=dense)
    s_ref, c_ref, d_ref = raster_images(sp, hw, 0.02)
    s_got, c_got, d_got = raster_images_partitioned(sp, hw, 0.02, part_size=part_size)
    np.testing.assert_array_equal(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s_got), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


def test_partitioned_band_across_parts():
    # identical-depth clusters in one pixel so the band spans elements that
    # straddle part boundaries
    n, w, h = 5000, 8, 8
    rng = np.random.default_rng(2)
    z = np.sort(rng.uniform(2.0, 2.019, n)).astype(np.float32)  # all in band
    pts = np.stack([np.zeros(n), np.zeros(n), z], 1).astype(np.float32)
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    cam = Camera.from_params(10.0, 10.0, 4, 4, 8, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    sp = project_and_sort(jnp.asarray(pts), jnp.asarray(cols), M, width=8, height=8)
    s_ref, c_ref, d_ref = raster_images(sp, 64, 0.02)
    s_got, c_got, d_got = raster_images_partitioned(sp, 64, 0.02, part_size=256)
    np.testing.assert_array_equal(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s_got), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))
    assert int(c_ref.max()) == n  # every point accumulated in one pixel


def test_partitioned_empty_scene():
    sp, hw = make_sp(512, 16, 16, seed=3)
    # kill all points via an impossible camera: use valid=None but z<=0
    import jax.numpy as jnp
    from rtnr_tpu.config import DEPTH_EMPTY

    s, c, d = raster_images_partitioned(sp, hw, 0.02, part_size=256)
    s_ref, c_ref, d_ref = raster_images(sp, hw, 0.02)
    np.testing.assert_array_equal(np.asarray(s), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d_ref))
