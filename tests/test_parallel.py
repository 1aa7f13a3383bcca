"""Sharded-rendering equivalence tests on a virtual 8-device CPU mesh.

Asserts the multi-device render is bit-identical to the single-device one
after the pmin depth merge + psum color merge (SURVEY.md section 5's
determinism-replaces-sanitizers stance)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.models.unet import UNet, init_unet
from rtnr_tpu.ops.raster import rasterize
from rtnr_tpu.parallel import (
    make_mesh,
    rasterize_point_sharded,
    render_filtered_sharded,
    render_full_batch,
)
from rtnr_tpu.pipeline import render_filtered
from rtnr_tpu.scene import Scene


@pytest.fixture(scope="module")
def setup():
    scene = Scene.synthetic(40_000, seed=0, extent=8.0)
    cam = Camera.from_params(60, 60, 32, 32, 64, 64)
    E = np.eye(4)
    E[2, 3] = 10.0
    pts, cols, valid = scene.sorted_by_block().device_arrays(pad_to_multiple=8 * 128)
    M = jnp.asarray(cam.cam_proj(E), jnp.float32)
    return (jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid), M, cam)


def test_mesh_construction():
    m = make_mesh()
    assert m.devices.size == 8
    m2 = make_mesh((2, 4))
    assert m2.shape == {"batch": 2, "points": 4}
    with pytest.raises(AssertionError):
        make_mesh((3, 4))


def test_point_sharded_raster_matches_single_device(setup):
    pts, cols, valid, M, cam = setup
    mesh = make_mesh((1, 8))
    rgb_s, depth_s = rasterize_point_sharded(
        pts, cols, valid, M, mesh, width=cam.width, height=cam.height
    )
    rgb_1, depth_1 = rasterize(pts, cols, M, width=cam.width, height=cam.height, valid=valid)
    np.testing.assert_array_equal(np.asarray(depth_s), np.asarray(depth_1))
    np.testing.assert_array_equal(np.asarray(rgb_s), np.asarray(rgb_1))


def test_band_uses_global_min_across_shards():
    """Construct a case where the global min lives on a different shard than
    an in-band point: shard merge must still apply the 2cm band globally."""
    cam = Camera.from_params(10, 10, 4, 4, 8, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    # 8 points, one per shard: shard0 holds depth 2.000 (global min),
    # shard7 holds 2.015 (in band), others far behind (out of band).
    zs = [2.0, 3.0, 3.0, 3.0, 3.0, 3.0, 3.0, 2.015]
    pts = np.array([[0, 0, z] for z in zs], np.float32)
    cols = np.array([[10 * (i + 1), 0, 0] for i in range(8)], np.uint8)
    valid = np.ones(8, bool)
    mesh = make_mesh((1, 8))
    rgb, depth = rasterize_point_sharded(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid), M, mesh, width=8, height=8
    )
    assert np.asarray(depth)[4, 4] == np.float32(2.0)
    # average of colors 10 and 80 = 45
    assert np.asarray(rgb)[4, 4, 0] == 45


def test_filtered_sharded_matches_single(setup):
    pts, cols, valid, M, cam = setup
    mesh = make_mesh((2, 4))
    Ms = jnp.stack([M, M])
    out = render_filtered_sharded(
        pts, cols, valid, Ms, mesh, width=cam.width, height=cam.height
    )
    ref = render_filtered(pts, cols, valid, M, width=cam.width, height=cam.height)
    for f in range(2):
        np.testing.assert_array_equal(np.asarray(out["depth"][f]), np.asarray(ref["depth"]))
        np.testing.assert_array_equal(np.asarray(out["rgb"][f]), np.asarray(ref["rgb"]))
        np.testing.assert_allclose(
            np.asarray(out["unet_input"][f]), np.asarray(ref["unet_input"]), atol=1e-7
        )


def test_full_batch_runs(setup):
    pts, cols, valid, M, cam = setup
    mesh = make_mesh((2, 4))
    unet = UNet(features=(4, 8), dtype=jnp.float32)
    _, variables = init_unet(jax.random.PRNGKey(0), 64, 64, features=(4, 8))
    Ms = jnp.stack([M, M, M, M])
    out = render_full_batch(
        pts, cols, valid, Ms, mesh, unet, variables, width=cam.width, height=cam.height
    )
    assert out["rgb_unet"].shape == (4, 64, 64, 3)
    assert np.isfinite(np.asarray(out["rgb_f"])).all()
    # all four frames identical cameras -> identical outputs
    np.testing.assert_array_equal(np.asarray(out["rgb_unet"][0]), np.asarray(out["rgb_unet"][3]))
