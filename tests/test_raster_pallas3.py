"""Pallas v3 (double-buffered, MXU-scan) fused resolve: interpret-mode
bit-exactness against the XLA reference formulation."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import project_and_sort, raster_images
from rtnr_tpu.ops.raster_pallas3 import raster_images_pallas3
from tests.test_raster_pallas import make_sp


@pytest.mark.parametrize("factored", [False, True])
@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.parametrize("L,S", [(2048, 256), (1024, 128)])
def test_pallas3_resolve_interpret_exact(dense, L, S, factored):
    sp, hw = make_sp(6000, 48, 32, seed=1, dense=dense)
    s_ref, c_ref, d_ref = raster_images(sp, hw, 0.02)
    s_got, c_got, d_got = raster_images_pallas3(
        sp, hw, 0.02, part_size=L, sub_chunk=S, interpret=True, factored=factored
    )
    np.testing.assert_array_equal(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s_got), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


def test_pallas3_band_spanning_parts():
    n = 5000
    rng = np.random.default_rng(2)
    z = np.sort(rng.uniform(2.0, 2.019, n)).astype(np.float32)
    pts = np.stack([np.zeros(n), np.zeros(n), z], 1).astype(np.float32)
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    cam = Camera.from_params(10.0, 10.0, 4, 4, 8, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    sp = project_and_sort(jnp.asarray(pts), jnp.asarray(cols), M, width=8, height=8)
    s_ref, c_ref, d_ref = raster_images(sp, 64, 0.02)
    s_got, c_got, d_got = raster_images_pallas3(
        sp, 64, 0.02, part_size=1024, sub_chunk=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s_got), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))
    assert int(c_ref.max()) == n
