"""Real-TPU regression gates for the production inference path.

Run on the chip:  RTNR_TPU_TESTS=1 python -m pytest tests -m tpu -q

Covers what CI-shaped CPU tests cannot (VERDICT r2 item 7):
- the packed phase-planar U-Net's NUMERIC parity vs the XLA conv path at a
  production-scale shape (the CPU tests only reach 32x16 interpret runs);
- chained-loop PERF floors for the two dominant stages at the bench shape,
  so a silent kernel regression fails the suite instead of the next bench.

Perf thresholds carry ~20% headroom over the round-3 measured numbers
(PROFILE_r03.md) — loose enough for run-to-run noise (~±1 ms observed on
the shared chip), tight enough to catch a kernel falling off its path.
"""

import os
import time

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.tpu

_ON_TPU = jax.default_backend() == "tpu" if os.environ.get("RTNR_TPU_TESTS") == "1" else False

if os.environ.get("RTNR_TPU_TESTS") == "1" and not _ON_TPU:
    raise RuntimeError("RTNR_TPU_TESTS=1 but jax backend is not TPU")


def _chained_ms(body, init, reps=10):
    @jax.jit
    def run(init):
        return jax.lax.fori_loop(0, reps, body, init)

    jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    jax.block_until_ready(run(init))
    return (time.perf_counter() - t0) / reps * 1e3


@pytest.fixture(scope="module")
def bench_scene():
    from rtnr_tpu.camera import Camera
    from rtnr_tpu.scene import Scene

    scene = Scene.synthetic(5_000_000, seed=0, extent=10.0)
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    cam = Camera.from_params(1100.0, 1100.0, 960.0, 540.0, 1920, 1080)
    E = np.eye(4)
    E[2, 3] = 12.0
    return (
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid),
        jnp.asarray(cam.cam_proj(E), jnp.float32),
    )


def test_unet_phase_parity_production_shape():
    """Phase-planar Pallas U-Net vs XLA convs at 1088x1920, full width:
    max abs deviation within the bf16 reduction-order budget (PARITY.md)."""
    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, init_unet

    features = (64, 128, 256, 512)
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = jax.device_put(fold_batchnorm(raw))
    H, W = 1088, 1920
    key = jax.random.PRNGKey(1)
    x = jnp.concatenate(
        [
            jax.random.uniform(key, (1, H, W, 3), jnp.float32),
            (jax.random.uniform(key, (1, H, W, 1)) > 0.5).astype(jnp.float32),
            jax.random.uniform(key, (1, H, W, 1), jnp.float32, -1.0, 1.0),
        ],
        axis=-1,
    ).astype(jnp.bfloat16)

    unet_p = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                  conv_impl="pallas")
    unet_x = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                  conv_impl="xla")
    yp = np.asarray(jax.jit(unet_p.apply)(variables, x), np.float32)
    yx = np.asarray(jax.jit(unet_x.apply)(variables, x), np.float32)
    dev = np.abs(yp - yx).max()
    assert dev < 0.012, f"phase-vs-XLA deviation {dev} exceeds bf16 budget"


def test_raster_perf_floor(bench_scene):
    """Full raster (project + sort + resolve) at 1080p/5M: chained-loop
    floor with headroom over the measured ~20 ms (PROFILE_r03.md)."""
    from rtnr_tpu.ops.raster import rasterize

    points, colors, valid, M0 = bench_scene

    def body(k, acc):
        M = M0.at[0, 3].add(acc * jnp.float32(0.0) + 0.01 * k.astype(jnp.float32))
        rgb, depth = rasterize(points, colors, M, width=1920, height=1080,
                               valid=valid)
        return acc + depth[0, 0] + rgb[0, 0, 0].astype(jnp.float32)

    ms = _chained_ms(body, jnp.float32(0.0))
    assert ms < 26.0, f"raster {ms:.2f} ms/frame exceeds the 26 ms gate"


def test_grad_step_perf_floor(bench_scene):
    """Differentiable-raster gradient step at 1080p/5M: chained-loop floor
    with headroom over the measured 63.3 ms (PROFILE_r04.md: carrier-free
    compact+expand forward + sort-free gather backward)."""
    from rtnr_tpu.ops.raster_diff import rasterize_diff_sorted

    points, colors, valid, M0 = bench_scene
    colors = colors.astype(jnp.float32)
    target = jax.random.uniform(
        jax.random.PRNGKey(0), (1080, 1920, 3), jnp.float32, 0.0, 255.0
    )

    def loss(points, colors, M):
        out = rasterize_diff_sorted(
            points, colors, M, width=1920, height=1080, valid=valid
        )
        diff = (out.rgb - target) * out.mask[..., None]
        return jnp.mean(diff * diff) + jnp.sum(
            jnp.where(out.mask, out.depth, 0.0)
        ) * jnp.float32(1e-9)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    def body(k, acc):
        M = M0.at[0, 3].add(acc * jnp.float32(0.0) + 0.01 * k.astype(jnp.float32))
        gp, gc, gm = grad(points, colors, M)
        return acc + gm[2, 3]

    ms = _chained_ms(body, jnp.float32(0.0))
    assert ms < 80.0, f"grad step {ms:.2f} ms exceeds the 80 ms gate"


def test_unet_perf_floor():
    """Phase U-Net apply at 1088x1920: floor with headroom over ~23 ms."""
    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, init_unet

    features = (64, 128, 256, 512)
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = jax.device_put(fold_batchnorm(raw))
    unet = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True)
    x0 = jnp.zeros((1, 1088, 1920, 5), jnp.bfloat16)

    def body(k, x):
        y = unet.apply(variables, x)
        return jnp.concatenate([y * jnp.bfloat16(1e-3), x[..., 3:]], axis=-1)

    ms = _chained_ms(body, x0)
    assert ms < 28.0, f"U-Net {ms:.2f} ms/apply exceeds the 28 ms gate"


def test_unet_static_int8_parity_and_floor():
    """Calibrated static-int8 phase U-Net at 1088x1920: error budget vs the
    exact bf16 phase path on REAL Mosaic kernels (the CPU tests only cover
    interpret mode), and a chained perf floor over the measured 16.2 ms
    (PROFILE_r04.md)."""
    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, calibrate_act_scales, init_unet

    features = (64, 128, 256, 512)
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = jax.device_put(fold_batchnorm(raw))
    H, W = 1088, 1920
    key = jax.random.PRNGKey(1)
    x = jnp.concatenate(
        [
            jax.random.uniform(key, (1, H, W, 3), jnp.float32),
            (jax.random.uniform(key, (1, H, W, 1)) > 0.5).astype(jnp.float32),
            jax.random.uniform(key, (1, H, W, 1), jnp.float32, -1.0, 1.0),
        ],
        axis=-1,
    ).astype(jnp.bfloat16)

    base = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True)
    qnet = base.clone(quant_int8=True)
    scales = calibrate_act_scales(base, variables, x)
    ya = np.asarray(jax.jit(base.apply)(variables, x), np.float32)
    yq = np.asarray(
        jax.jit(qnet.apply)(variables, x, act_scales=scales), np.float32
    )
    rng = max(float(np.abs(ya).max()), 1e-6)
    assert np.abs(ya - yq).max() <= 0.10 * rng
    assert np.abs(ya - yq).mean() <= 0.02 * rng

    def body(k, xx):
        y = qnet.apply(variables, xx, act_scales=scales)
        return jnp.concatenate([y * jnp.bfloat16(1e-3), xx[..., 3:]], axis=-1)

    ms = _chained_ms(body, x)
    assert ms < 19.5, f"static-int8 U-Net {ms:.2f} ms exceeds the 19.5 ms gate"


def test_bench_fps_floor(bench_scene):
    """Whole-pipeline frames/sec at the bench operating point (static-int8
    U-Net, 1080p/5M): floor with headroom under the measured 26.6 fps
    (BENCH_r04) so the scoreboard can't silently regress."""
    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, calibrate_act_scales, init_unet
    from rtnr_tpu.ops.conv_phase import to_phase
    from rtnr_tpu.pipeline import pyramid_pad_shape, render_filtered, render_full

    points, colors, valid, M0 = bench_scene
    features = (64, 128, 256, 512)
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = jax.device_put(fold_batchnorm(raw))
    unet = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                quant_int8=True)
    mid = render_filtered(points, colors, valid, M0, width=1920, height=1080)
    ph, pw = pyramid_pad_shape(1080, 1920, 4)
    xp = to_phase(mid["unet_input"][None].astype(jnp.bfloat16), 16)
    scales = calibrate_act_scales(unet, variables, x_phase=(xp, ph, pw, 5))

    def body(k, acc):
        M = M0.at[0, 3].add(acc * jnp.float32(0.0) + 0.01 * k.astype(jnp.float32))
        out = render_full(points, colors, valid, M, unet, variables,
                          width=1920, height=1080, act_scales=scales)
        return (acc + out["rgb_f"][0, 0, 0]
                + out["raw_depth"][0, 0] * jnp.float32(1e-20))

    ms = _chained_ms(body, jnp.float32(0.0))
    fps = 1e3 / ms
    assert fps > 24.0, f"full pipeline {fps:.2f} fps under the 24 fps gate"


def test_end_to_end_int8_error_budget(bench_scene):
    """END-TO-END int8-vs-bf16 RGB error at the bench operating point
    (VERDICT r5 item 3): the full pipeline (raster + prefilter + U-Net)
    rendered with the deployment static-int8 U-Net vs the exact bf16
    pipeline, on the real 5M-pt / 1080p frame. The budget is the PARITY.md
    ~2%-of-range mean — precision can never silently buy fps beyond it.
    (The U-Net-in-isolation gate above uses random inputs; this one uses
    the REAL rendered activations.)"""
    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, calibrate_act_scales, init_unet
    from rtnr_tpu.ops.conv_phase import to_phase
    from rtnr_tpu.pipeline import pyramid_pad_shape, render_filtered, render_full

    points, colors, valid, M0 = bench_scene
    features = (64, 128, 256, 512)
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = jax.device_put(fold_batchnorm(raw))
    exact = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True)
    qnet = exact.clone(quant_int8=True)
    mid = render_filtered(points, colors, valid, M0, width=1920, height=1080)
    ph, pw = pyramid_pad_shape(1080, 1920, 4)
    xp = to_phase(mid["unet_input"][None].astype(jnp.bfloat16), 16)
    scales = calibrate_act_scales(exact, variables, x_phase=(xp, ph, pw, 5))

    # render a NON-calibration pose too (the trajectory drift case)
    for dx in (0.0, 0.25):
        M = M0.at[0, 3].add(jnp.float32(dx))
        a = render_full(points, colors, valid, M, exact, variables,
                        width=1920, height=1080)
        q = render_full(points, colors, valid, M, qnet, variables,
                        width=1920, height=1080, act_scales=scales)
        ya = np.asarray(a["rgb_f"], np.float32)
        yq = np.asarray(q["rgb_f"], np.float32)
        rng = max(float(np.abs(ya).max()), 1e-6)
        assert np.abs(ya - yq).mean() <= 0.02 * rng, f"dx={dx} mean err"
        assert np.abs(ya - yq).max() <= 0.12 * rng, f"dx={dx} max err"
