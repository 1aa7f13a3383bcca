"""End-to-end pipeline tests: raster -> prefilter -> U-Net in one program."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.config import RenderConfig
from rtnr_tpu.models.unet import UNet, init_unet
from rtnr_tpu.pipeline import (
    Renderer,
    pad_to_pyramid,
    pyramid_pad_shape,
    render_filtered,
    render_full,
    render_rgbd,
)
from rtnr_tpu.scene import Scene
from tests.oracle import FLT_MAX, oracle_prefilter, oracle_rasterize


@pytest.fixture(scope="module")
def small_setup():
    scene = Scene.synthetic(30_000, seed=0, extent=8.0)
    cam = Camera.from_params(60, 60, 32, 32, 64, 64)
    E = np.eye(4)
    E[2, 3] = 10.0
    return scene, cam, E


def test_render_rgbd_matches_oracle(small_setup):
    scene, cam, E = small_setup
    r = Renderer(scene)
    out = r.compute_rgbd(cam, E)
    M = cam.cam_proj(E).astype(np.float32)
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    rgb_o, depth_o = oracle_rasterize(pts, cols, M, 64, 64, valid=valid)
    np.testing.assert_array_equal(out["depth"], depth_o)
    np.testing.assert_array_equal(out["rgb"], rgb_o)
    assert "projection[" in str(r.last_timings)


def test_render_filtered_matches_oracle(small_setup):
    scene, cam, E = small_setup
    r = Renderer(scene)
    out = r.compute_filtered_rgbd(cam, E)
    rgb_o, depth_o = oracle_rasterize(
        *scene.sorted_by_block().device_arrays(1024)[:2],
        cam.cam_proj(E).astype(np.float32), 64, 64,
        valid=scene.sorted_by_block().device_arrays(1024)[2],
    )
    exp = oracle_prefilter(depth_o, rgb_o, levels=4)
    np.testing.assert_array_equal(out["mask"], exp["mask"])
    np.testing.assert_array_equal(out["rgb"], exp["filtered_rgb"])
    np.testing.assert_array_equal(out["depth"], exp["filtered_depth"])
    np.testing.assert_allclose(out["unet_input"], exp["unet_input"], atol=1e-7)


def test_render_full_runs_and_is_finite(small_setup):
    scene, cam, E = small_setup
    cfg = RenderConfig(unet_features=(8, 16), unet_dtype="f32")
    _, variables = init_unet(jax.random.PRNGKey(0), 64, 64, features=(8, 16))
    r = Renderer(scene, config=cfg, unet_variables=variables)
    out = r.compute_full(cam, E)
    assert out["rgb"].shape == (64, 64, 3) and out["rgb"].dtype == np.uint8
    assert np.isfinite(out["rgb_f"]).all()
    # uint8 output is the saturating x255 of the float output
    expect = np.clip(np.rint(out["rgb_f"] * 255.0), 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(out["rgb"], expect)


def test_staged_timing_matches_fused(small_setup):
    """timings=True must report three real stage times and produce output
    identical to the fused path (same programs, just split)."""
    scene, cam, E = small_setup
    cfg = RenderConfig(unet_features=(8, 16), unet_dtype="f32")
    _, variables = init_unet(jax.random.PRNGKey(0), 64, 64, features=(8, 16))
    r = Renderer(scene, config=cfg, unet_variables=variables)
    fused = r.compute_full(cam, E)
    staged = r.compute_full(cam, E, timings=True)
    t = r.last_timings
    assert t.projection_ms > 0 and t.filter_ms > 0 and t.unet_ms > 0
    assert t.total_ms >= t.projection_ms + t.filter_ms + t.unet_ms - 1e-6
    assert "projection[" in str(t) and "unet[" in str(t)
    np.testing.assert_array_equal(staged["depth"], fused["depth"])
    np.testing.assert_array_equal(staged["raw_depth"], fused["raw_depth"])
    np.testing.assert_allclose(staged["rgb_f"], fused["rgb_f"], atol=2e-6)
    np.testing.assert_array_equal(staged["mask"], fused["mask"])


def test_full_requires_model(small_setup):
    scene, cam, E = small_setup
    r = Renderer(scene)
    with pytest.raises(RuntimeError, match="No U-Net variables"):
        r.compute_full(cam, E)


def test_pyramid_padding_path():
    # Non-divisible resolution (60x40): padded to 64x48 internally, cropped back.
    scene = Scene.synthetic(10_000, seed=1, extent=6.0)
    cam = Camera.from_params(50, 50, 20, 30, 40, 60)  # W=40, H=60
    E = np.eye(4)
    E[2, 3] = 8.0
    cfg = RenderConfig(unet_features=(4, 8), unet_dtype="f32")
    _, variables = init_unet(jax.random.PRNGKey(1), 64, 48, features=(4, 8))
    r = Renderer(scene, config=cfg, unet_variables=variables)
    out = r.compute_full(cam, E)
    assert out["rgb"].shape == (60, 40, 3)
    assert out["depth"].shape == (60, 40)
    assert pyramid_pad_shape(60, 40, 4) == (64, 48)
    # padded region must not contaminate kept pixels: all finite
    assert np.isfinite(out["rgb_f"]).all()


def test_pad_to_pyramid_values():
    d = jnp.ones((30, 30), jnp.float32)
    rgb = jnp.ones((30, 30, 3), jnp.uint8)
    dp, cp = pad_to_pyramid(d, rgb, 4)
    assert dp.shape == (32, 32) and cp.shape == (32, 32, 3)
    assert float(dp[31, 31]) == FLT_MAX
    assert int(cp[31, 31, 0]) == 0
