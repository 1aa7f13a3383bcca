"""Golden-value tests: sort-based raster vs loop-based numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import rasterize, rasterize_scatter, depth_min_max, project_points
from tests.oracle import oracle_rasterize, oracle_project, FLT_MAX


def make_case(n=5000, w=64, h=48, seed=0, extent=4.0, z_range=(2.0, 8.0)):
    rng = np.random.default_rng(seed)
    # points in front of a camera at origin looking +z
    pts = np.stack(
        [
            rng.uniform(-extent, extent, n),
            rng.uniform(-extent, extent, n),
            rng.uniform(*z_range, n),
        ],
        axis=1,
    ).astype(np.float32)
    cols = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    cam = Camera.from_params(fx=40.0, fy=40.0, cx=w / 2, cy=h / 2, width=w, height=h)
    M = cam.cam_proj(np.eye(4)).astype(np.float32)
    return pts, cols, M, cam


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_projection_matches_oracle(seed):
    pts, _, M, _ = make_case(seed=seed)
    u, v, z = project_points(jnp.asarray(pts), jnp.asarray(M))
    uo, vo, zo = oracle_project(pts, M)
    ok = zo > 0
    np.testing.assert_array_equal(np.asarray(u)[ok], uo[ok].astype(np.int32))
    np.testing.assert_array_equal(np.asarray(v)[ok], vo[ok].astype(np.int32))
    np.testing.assert_allclose(np.asarray(z), zo, rtol=0, atol=0)


@pytest.mark.parametrize("seed,n", [(0, 5000), (1, 20000), (2, 777)])
def test_raster_matches_oracle(seed, n):
    pts, cols, M, cam = make_case(n=n, seed=seed)
    rgb, depth = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M), width=cam.width, height=cam.height
    )
    rgb_o, depth_o = oracle_rasterize(pts, cols, M, cam.width, cam.height)
    np.testing.assert_array_equal(np.asarray(depth), depth_o)
    np.testing.assert_array_equal(np.asarray(rgb), rgb_o)


def test_raster_with_behind_and_oob_points():
    rng = np.random.default_rng(3)
    n, w, h = 4000, 32, 32
    pts = rng.uniform(-10, 10, size=(n, 3)).astype(np.float32)  # many behind/out of frame
    cols = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    cam = Camera.from_params(20.0, 20.0, w / 2, h / 2, w, h)
    M = cam.cam_proj(np.eye(4)).astype(np.float32)
    rgb, depth = rasterize(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M), width=w, height=h)
    rgb_o, depth_o = oracle_rasterize(pts, cols, M, w, h)
    np.testing.assert_array_equal(np.asarray(depth), depth_o)
    np.testing.assert_array_equal(np.asarray(rgb), rgb_o)


def test_raster_valid_mask():
    pts, cols, M, cam = make_case(n=1000)
    valid = np.zeros(1000, bool)
    valid[:500] = True
    rgb, depth = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
        width=cam.width, height=cam.height, valid=jnp.asarray(valid),
    )
    rgb_o, depth_o = oracle_rasterize(pts[:500], cols[:500], M, cam.width, cam.height)
    np.testing.assert_array_equal(np.asarray(depth), depth_o)
    np.testing.assert_array_equal(np.asarray(rgb), rgb_o)


def test_scatter_variant_agrees():
    pts, cols, M, cam = make_case(n=8000, seed=5)
    a_rgb, a_d = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M), width=cam.width, height=cam.height
    )
    b_rgb, b_d = rasterize_scatter(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M), width=cam.width, height=cam.height
    )
    np.testing.assert_array_equal(np.asarray(a_d), np.asarray(b_d))
    np.testing.assert_array_equal(np.asarray(a_rgb), np.asarray(b_rgb))


def test_empty_pixels_are_flt_max_and_black():
    # no points at all
    pts = np.zeros((8, 3), np.float32)
    cols = np.zeros((8, 3), np.uint8)
    cam = Camera.from_params(10, 10, 8, 8, 16, 16)
    M = cam.cam_proj(np.eye(4)).astype(np.float32)
    valid = np.zeros(8, bool)
    rgb, depth = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
        width=16, height=16, valid=jnp.asarray(valid),
    )
    assert np.all(np.asarray(depth) == FLT_MAX)
    assert np.all(np.asarray(rgb) == 0)
    dmin, dmax = depth_min_max(depth.reshape(-1))
    assert np.isinf(np.asarray(dmin))


def test_depth_band_semantics():
    # two points, same pixel, depths 2.0 and 2.019 (in band) / 2.021 (out)
    cam = Camera.from_params(10, 10, 4, 4, 8, 8)
    M = cam.cam_proj(np.eye(4)).astype(np.float32)
    base = np.array([[0.0, 0.0, 2.0]], np.float32)
    for dz, expect_avg in [(0.019, True), (0.021, False)]:
        pts = np.concatenate([base, base + [[0, 0, dz]]]).astype(np.float32)
        cols = np.array([[100, 0, 0], [200, 0, 0]], np.uint8)
        rgb, depth = rasterize(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M), width=8, height=8)
        px = np.asarray(rgb)[4, 4]
        assert np.asarray(depth)[4, 4] == np.float32(2.0)
        assert px[0] == (150 if expect_avg else 100)


def test_rasterize_packed_matches_rasterize():
    """rasterize_packed's r|g<<8|b<<16 output equals rasterize's uint8
    channels (and the same depth) — the fused pipeline's raster form."""
    from rtnr_tpu.ops.raster import rasterize_packed, unpack_rgb8

    pts, cols, M, cam = make_case(n=20_000, seed=11)
    rgb, depth = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
        width=cam.width, height=cam.height,
    )
    packed, depth2 = rasterize_packed(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
        width=cam.width, height=cam.height,
    )
    np.testing.assert_array_equal(np.asarray(depth), np.asarray(depth2))
    np.testing.assert_array_equal(
        np.asarray(unpack_rgb8(packed)), np.asarray(rgb)
    )
