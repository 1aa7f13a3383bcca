"""Golden-value tests: depth prefilter vs loop-based numpy oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.prefilter import (
    bilinear_up2,
    compare_levels,
    depth_prefilter,
    laplacian_edge_mask,
    min_pool2,
)
from tests.oracle import (
    FLT_MAX,
    oracle_compare,
    oracle_laplacian_mask,
    oracle_min_pyramid,
    oracle_prefilter,
    oracle_rasterize,
    oracle_resize,
)


def make_depth(h=32, w=32, seed=0, empty_frac=0.3):
    rng = np.random.default_rng(seed)
    d = rng.uniform(1.0, 20.0, size=(h, w)).astype(np.float32)
    empty = rng.random((h, w)) < empty_frac
    d[empty] = FLT_MAX
    return d


@pytest.mark.parametrize("seed", [0, 1])
def test_min_pyramid(seed):
    d = make_depth(seed=seed)
    pyr_o = oracle_min_pyramid(d, 3)
    x = jnp.asarray(d)
    for lvl in range(1, 4):
        x = min_pool2(x)
        np.testing.assert_array_equal(np.asarray(x), pyr_o[lvl])


@pytest.mark.parametrize("seed", [0, 1])
def test_laplacian_mask(seed):
    d = make_depth(16, 16, seed=seed, empty_frac=0.4)
    got = laplacian_edge_mask(jnp.asarray(d), 0.03)
    exp = oracle_laplacian_mask(d, 0.03)
    np.testing.assert_array_equal(np.asarray(got), exp)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_compare_levels(seed):
    rng = np.random.default_rng(seed)
    low = make_depth(8, 8, seed=seed, empty_frac=0.3)
    high = make_depth(16, 16, seed=seed + 10, empty_frac=0.3)
    grad = rng.random((8, 8)) < 0.5
    got = compare_levels(jnp.asarray(low), jnp.asarray(high), jnp.asarray(grad), 1.025)
    exp = oracle_compare(low, high, grad, 1.025)
    np.testing.assert_array_equal(np.asarray(got), exp)


@pytest.mark.parametrize("seed", [0, 1])
def test_bilinear_resize(seed):
    rng = np.random.default_rng(seed)
    low = make_depth(8, 8, seed=seed, empty_frac=0.2)
    high = make_depth(16, 16, seed=seed + 20, empty_frac=0.2)
    keep = rng.random((16, 16)) < 0.5
    filled = bilinear_up2(jnp.asarray(low), (16, 16))
    got = np.where(keep, high, np.asarray(filled))
    exp = oracle_resize(low, high, keep)
    np.testing.assert_allclose(got, exp, rtol=0, atol=0)


@pytest.mark.parametrize("seed,shape", [(0, (32, 32)), (1, (64, 48)), (2, (32, 64))])
def test_full_prefilter_matches_oracle(seed, shape):
    h, w = shape
    d = make_depth(h, w, seed=seed)
    rng = np.random.default_rng(seed + 99)
    rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    got = depth_prefilter(jnp.asarray(d), jnp.asarray(rgb), levels=4)
    exp = oracle_prefilter(d, rgb, levels=4)
    np.testing.assert_array_equal(np.asarray(got["mask"]), exp["mask"])
    np.testing.assert_array_equal(np.asarray(got["filtered_depth"]), exp["filtered_depth"])
    np.testing.assert_array_equal(np.asarray(got["filtered_rgb"]), exp["filtered_rgb"])
    np.testing.assert_allclose(
        np.asarray(got["unet_input"]), exp["unet_input"], rtol=0, atol=1e-7
    )


def test_prefilter_on_rendered_frame():
    """End-to-end: raster a synthetic scene, prefilter, compare to oracle."""
    rng = np.random.default_rng(7)
    n, w, h = 20000, 64, 64
    pts = np.stack(
        [rng.uniform(-4, 4, n), rng.uniform(-4, 4, n), rng.uniform(2, 10, n)], axis=1
    ).astype(np.float32)
    cols = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    cam = Camera.from_params(40, 40, w / 2, h / 2, w, h)
    M = cam.cam_proj(np.eye(4)).astype(np.float32)
    rgb_o, depth_o = oracle_rasterize(pts, cols, M, w, h)
    got = depth_prefilter(jnp.asarray(depth_o), jnp.asarray(rgb_o), levels=4)
    exp = oracle_prefilter(depth_o, rgb_o, levels=4)
    np.testing.assert_array_equal(np.asarray(got["mask"]), exp["mask"])
    np.testing.assert_allclose(
        np.asarray(got["unet_input"]), exp["unet_input"], rtol=0, atol=1e-7
    )


def test_prefilter_requires_divisible_dims():
    d = jnp.full((30, 32), 1.0, jnp.float32)
    rgb = jnp.zeros((30, 32, 3), jnp.uint8)
    with pytest.raises(AssertionError):
        depth_prefilter(d, rgb, levels=4)


def test_strip_mode_bitexact():
    """Strip mode (row_offset/total_h): halo-extended strips with
    global-row border semantics reproduce the full-image prefilter
    BIT-EXACTLY on their core rows — including the first/last strips whose
    outer halos are garbage (their values must never be consumed)."""
    import jax

    rng = np.random.default_rng(3)
    H, W, levels = 128, 32, 3
    halo, strip_h = 32, 32  # halo > the 28-row border-pollution bound
    depth = rng.uniform(2.0, 30.0, (H, W)).astype(np.float32)
    depth[rng.random((H, W)) < 0.3] = np.float32(3.4028235e38)  # empty
    # structured content so gradient edges + refills actually fire
    depth[40:80, 8:24] *= 0.2
    rgb = rng.integers(0, 256, (H, W, 3), dtype=np.uint8)

    full = depth_prefilter(jnp.asarray(depth), jnp.asarray(rgb), levels=levels)
    dmin, dmax = full["depth_min"], full["depth_max"]

    for t in range(H // strip_h):
        a = t * strip_h
        lo, hi = a - halo, a + strip_h + halo
        ext_d = np.full((hi - lo, W), 12345.0, np.float32)  # garbage filler
        ext_c = np.zeros((hi - lo, W, 3), np.uint8)
        src_lo, src_hi = max(lo, 0), min(hi, H)
        ext_d[src_lo - lo : src_hi - lo] = depth[src_lo:src_hi]
        ext_c[src_lo - lo : src_hi - lo] = rgb[src_lo:src_hi]
        out = depth_prefilter(
            jnp.asarray(ext_d), jnp.asarray(ext_c), levels=levels,
            row_offset=jnp.int32(lo), total_h=H, minmax=(dmin, dmax),
        )
        sl_core = slice(halo, halo + strip_h)
        sl_full = slice(a, a + strip_h)
        for key in ("unet_input", "mask", "filtered_depth", "filtered_rgb"):
            np.testing.assert_array_equal(
                np.asarray(out[key][sl_core]), np.asarray(full[key][sl_full]),
                err_msg=f"strip {t} field {key}",
            )
