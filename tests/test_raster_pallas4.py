"""Pallas v4 (carrier-free two-kernel) resolve: interpret-mode
bit-exactness against the carrier-based XLA reference formulation."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import project_and_sort, raster_images
from rtnr_tpu.ops.raster_pallas4 import raster_images_pallas4
from tests.test_foils import make_sp


def make_sp_nc(n, w, h, seed=0, dense=False):
    """Carrier-free sorted stream with the same points as make_sp."""
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
        jnp.asarray(pts), jnp.asarray(cols), M, width=w, height=h, carriers=False
    )


@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.parametrize("L,S,PL,SE", [(2048, 256, 1024, 128), (1024, 128, 512, 128)])
def test_pallas4_resolve_interpret_exact(dense, L, S, PL, SE):
    sp, hw = make_sp(6000, 48, 32, seed=1, dense=dense)
    sp_nc = make_sp_nc(6000, 48, 32, seed=1, dense=dense)
    s_ref, c_ref, d_ref = raster_images(sp, hw, 0.02)
    s_got, c_got, d_got = raster_images_pallas4(
        sp_nc, hw, 0.02, part_size=L, sub_chunk=S,
        expand_part=PL, expand_sub=SE, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s_got), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


def test_pallas4_band_spanning_parts():
    """5000 same-pixel points within one 2cm band, crossing part boundaries."""
    n = 5000
    rng = np.random.default_rng(2)
    z = np.sort(rng.uniform(2.0, 2.019, n)).astype(np.float32)
    pts = np.stack([np.zeros(n), np.zeros(n), z], 1).astype(np.float32)
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    cam = Camera.from_params(10.0, 10.0, 4, 4, 8, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    sp = project_and_sort(jnp.asarray(pts), jnp.asarray(cols), M, width=8, height=8)
    sp_nc = project_and_sort(
        jnp.asarray(pts), jnp.asarray(cols), M, width=8, height=8, carriers=False
    )
    s_ref, c_ref, d_ref = raster_images(sp, 64, 0.02)
    s_got, c_got, d_got = raster_images_pallas4(
        sp_nc, 64, 0.02, part_size=1024, sub_chunk=128,
        expand_part=512, expand_sub=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s_got), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))
    assert int(c_ref.max()) == n


def test_pallas4_empty_scene():
    """No points in frame -> all pixels empty (count 0, depth FLT_MAX)."""
    pts = np.array([[0.0, 0.0, -5.0]], np.float32)  # behind camera
    cols = np.array([[10, 20, 30]], np.uint8)
    cam = Camera.from_params(10.0, 10.0, 4, 4, 8, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    sp_nc = project_and_sort(
        jnp.asarray(pts), jnp.asarray(cols), M, width=8, height=8, carriers=False
    )
    s, c, d = raster_images_pallas4(
        sp_nc, 64, 0.02, part_size=1024, sub_chunk=128,
        expand_part=512, expand_sub=128, interpret=True,
    )
    assert int(np.asarray(c).sum()) == 0
    assert np.all(np.asarray(s) == 0)
    np.testing.assert_array_equal(
        np.asarray(d), np.full(64, np.float32(3.4028235e38))
    )


@pytest.mark.parametrize("dense", [False, True])
def test_pallas4_packed_out_interpret_exact(dense):
    """packed_out: the in-kernel integer-average resolve (reference
    render.cu:145-162) matches resolve_uint8 over the separate-images path
    bit-exactly."""
    from rtnr_tpu.ops.raster import resolve_uint8

    sp_nc = make_sp_nc(6000, 48, 32, seed=3, dense=dense)
    hw = 48 * 32
    s_ref, c_ref, d_ref = raster_images_pallas4(
        sp_nc, hw, 0.02, part_size=2048, sub_chunk=256,
        expand_part=1024, expand_sub=128, interpret=True,
    )
    packed, d_got = raster_images_pallas4(
        sp_nc, hw, 0.02, part_size=2048, sub_chunk=256,
        expand_part=1024, expand_sub=128, packed_out=True, interpret=True,
    )
    rgb_ref = np.asarray(resolve_uint8(s_ref, c_ref))
    pk = np.asarray(packed)
    got = np.stack([pk & 255, (pk >> 8) & 255, (pk >> 16) & 255], axis=1)
    np.testing.assert_array_equal(got.astype(np.uint8), rgb_ref)
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))
