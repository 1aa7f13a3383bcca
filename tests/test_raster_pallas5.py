"""Pallas v5 (pixel-only sort + segmented-min winners) resolve:
interpret-mode bit-exactness against the carrier-based XLA reference
formulation, including cross-part boundary segments and the lookback
overflow fallback."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import project_and_sort, raster_images
from rtnr_tpu.ops.raster_pallas5 import raster_images_pallas5
from tests.test_foils import make_sp


def make_sp_nk1(n, w, h, seed=0, dense=False):
    """Carrier-free, pixel-only-sorted stream with the same points as
    make_sp (depth order within a pixel segment is arbitrary)."""
    rng = np.random.default_rng(seed)
    if dense:
        px = rng.integers(0, w, n)
        py = rng.integers(0, h // 4, n)
        z = rng.uniform(2.0, 8.0, n)
        pts = np.stack([(px - w / 2) * z / 40.0, (py - h / 2) * z / 40.0, z], 1)
    else:
        pts = np.stack(
            [rng.uniform(-3, 3, n), rng.uniform(-3, 3, n), rng.uniform(2, 8, n)], 1
        )
    pts = pts.astype(np.float32)
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    cam = Camera.from_params(40.0, 40.0, w / 2, h / 2, w, h)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    return project_and_sort(
        jnp.asarray(pts), jnp.asarray(cols), M, width=w, height=h,
        carriers=False, depth_key=False,
    )


def check(sp_ref, sp_nk1, hw, **kw):
    s_ref, c_ref, d_ref = raster_images(sp_ref, hw, 0.02)
    s_got, c_got, d_got = raster_images_pallas5(sp_nk1, hw, 0.02, interpret=True, **kw)
    np.testing.assert_array_equal(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s_got), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.parametrize("L,S,PL,SE", [(2048, 256, 1024, 128), (1024, 128, 512, 128)])
def test_pallas5_resolve_interpret_exact(dense, L, S, PL, SE):
    sp, hw = make_sp(6000, 48, 32, seed=1, dense=dense)
    sp_nk1 = make_sp_nk1(6000, 48, 32, seed=1, dense=dense)
    check(sp, sp_nk1, hw, part_size=L, sub_chunk=S, expand_part=PL, expand_sub=SE)


def _single_pixel_case(n, seed=2, zlo=2.0, zhi=2.019):
    """n points all on one pixel (exercises segment spans)."""
    rng = np.random.default_rng(seed)
    z = rng.uniform(zlo, zhi, n).astype(np.float32)  # deliberately UNsorted
    pts = np.stack([np.zeros(n), np.zeros(n), z], 1).astype(np.float32)
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    cam = Camera.from_params(10.0, 10.0, 4, 4, 8, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    sp = project_and_sort(jnp.asarray(pts), jnp.asarray(cols), M, width=8, height=8)
    sp_nk1 = project_and_sort(
        jnp.asarray(pts), jnp.asarray(cols), M, width=8, height=8,
        carriers=False, depth_key=False,
    )
    return sp, sp_nk1


def test_pallas5_band_spanning_two_parts():
    """One pixel's segment spans two parts (within the lookback window):
    the boundary re-reduction path, bit-exact."""
    sp, sp_nk1 = _single_pixel_case(1500)
    check(sp, sp_nk1, 64, part_size=1024, sub_chunk=128,
          expand_part=512, expand_sub=128)


def test_pallas5_band_partial():
    """Points straddling the 2 cm band on one pixel, spanning parts: only
    the in-band prefix of depths contributes (reference render.cu:106)."""
    sp, sp_nk1 = _single_pixel_case(1500, seed=5, zlo=2.0, zhi=2.3)
    check(sp, sp_nk1, 64, part_size=1024, sub_chunk=128,
          expand_part=512, expand_sub=128)


def test_pallas5_overflow_fallback():
    """A segment spanning >2 parts exceeds the lookback: the sticky flag
    must route through the lax.cond fallback (v4 on a re-sort), bit-exact."""
    sp, sp_nk1 = _single_pixel_case(5000)
    check(sp, sp_nk1, 64, part_size=1024, sub_chunk=128,
          expand_part=512, expand_sub=128)


def test_pallas5_multi_pixel_boundaries():
    """Many segments ending/starting exactly at part boundaries."""
    n = 4096
    rng = np.random.default_rng(7)
    # 16 pixels x 256 points each: segments align with sub-chunk edges
    px = np.repeat(np.arange(16), 256)
    z = rng.uniform(2.0, 8.0, n).astype(np.float32)
    pts = np.stack([(px - 4) * z / 10.0, np.zeros(n), z], 1).astype(np.float32)
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    cam = Camera.from_params(10.0, 10.0, 4, 4, 16, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    sp = project_and_sort(jnp.asarray(pts), jnp.asarray(cols), M, width=16, height=8)
    sp_nk1 = project_and_sort(
        jnp.asarray(pts), jnp.asarray(cols), M, width=16, height=8,
        carriers=False, depth_key=False,
    )
    check(sp, sp_nk1, 128, part_size=1024, sub_chunk=128,
          expand_part=512, expand_sub=128)


def test_pallas5_empty_scene():
    """No points in frame -> all pixels empty (count 0, depth FLT_MAX)."""
    pts = np.array([[0.0, 0.0, -5.0]], np.float32)  # behind camera
    cols = np.array([[10, 20, 30]], np.uint8)
    cam = Camera.from_params(10.0, 10.0, 4, 4, 8, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    sp_nk1 = project_and_sort(
        jnp.asarray(pts), jnp.asarray(cols), M, width=8, height=8,
        carriers=False, depth_key=False,
    )
    s, c, d = raster_images_pallas5(
        sp_nk1, 64, 0.02, part_size=1024, sub_chunk=128,
        expand_part=512, expand_sub=128, interpret=True,
    )
    assert int(np.asarray(c).sum()) == 0
    assert np.all(np.asarray(s) == 0)
    np.testing.assert_array_equal(
        np.asarray(d), np.full(64, np.float32(3.4028235e38))
    )
