"""Retired measured foils: ONE parity test each (VERDICT r5 item 7).

These implementations lost their perf comparisons and no longer inform any
decision, but stay importable/runnable behind env knobs (RTNR_RESOLVE=v1/
v2/v3, conv_impl="pallas_direct") with their retirement evidence in the
PROFILE notes:

- ops/raster_pallas.py  (v1 carrier resolve)       — PROFILE_r02.md (v3
  superseded it: 34.6 ms carrier path vs v4's 24.7 total)
- ops/raster_pallas2.py (v2 full-sublane resolve)  — PROFILE_r02.md
- ops/raster_pallas3.py (v3 carrier two-kernel)    — PROFILE_r03.md (v4
  carrier-free adopted; r2: v3 path 34.6 -> v4 24.7 ms)
- ops/conv_pallas.py    (direct NHWC 3x3 kernel)   — PROFILE_r02.md (the
  phase-planar conv family replaced it whole-net)

The production kernels' exhaustive suites live in test_raster_pallas4.py /
test_raster_pallas5.py / test_conv_phase.py. This module keeps exactly one
interpret-mode bit/parity check per foil so a refactor of shared machinery
(ops/raster.py project_and_sort, SortedPoints) can't silently break them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import project_and_sort, raster_images


def make_sp(n, w, h, seed=0, dense=False):
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
    sp = project_and_sort(jnp.asarray(pts), jnp.asarray(cols), M, width=w, height=h)
    return sp, w * h


@pytest.mark.parametrize("version", ["v1", "v2", "v3"])
def test_foil_resolve_bit_exact(version):
    from rtnr_tpu.ops.raster_pallas import raster_images_pallas
    from rtnr_tpu.ops.raster_pallas2 import raster_images_pallas2
    from rtnr_tpu.ops.raster_pallas3 import raster_images_pallas3

    fn = {
        "v1": raster_images_pallas,
        "v2": raster_images_pallas2,
        "v3": raster_images_pallas3,
    }[version]
    sp, hw = make_sp(6000, 48, 32, seed=1, dense=True)
    s_ref, c_ref, d_ref = raster_images(sp, hw, 0.02)
    s_got, c_got, d_got = fn(
        sp, hw, 0.02, part_size=1024, sub_chunk=128, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(c_got), np.asarray(c_ref))
    np.testing.assert_array_equal(np.asarray(s_got), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(d_got), np.asarray(d_ref))


def test_foil_conv_pallas_direct():
    from rtnr_tpu.ops.conv_pallas import conv3x3_pallas

    rng = np.random.default_rng(0)
    N, H, W, cs, f = 1, 8, 16, (16, 16), 16
    xs = [
        jnp.asarray(rng.normal(size=(N, H, W, c)).astype(np.float32), jnp.bfloat16)
        for c in cs
    ]
    kernel = jnp.asarray(rng.normal(size=(3, 3, sum(cs), f)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))
    got = conv3x3_pallas(xs, kernel, b, relu=True, rows_per_step=2, interpret=True)
    x = jnp.concatenate([x.astype(jnp.bfloat16) for x in xs], axis=-1)
    want = jax.lax.conv_general_dilated(
        x, kernel.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    want = jnp.maximum(want + b.astype(jnp.bfloat16), 0)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
