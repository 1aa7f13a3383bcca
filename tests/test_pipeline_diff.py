"""Config-4 tests: gradients through raster+prefilter(+U-Net), and a pose
refinement that actually converges by gradient descent."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.models.unet import UNet, init_unet
from rtnr_tpu.ops.pipeline_diff import render_filtered_diff, render_full_diff
from rtnr_tpu.ops.raster_diff import rasterize_diff


def pixel_center_scene(cam, n=60, seed=0, z_range=(4.0, 8.0)):
    """Points at exact pixel centers: pose perturbations within the FD
    window cannot flip pixel assignment."""
    rng = np.random.default_rng(seed)
    us = rng.integers(1, cam.width - 1, n)
    vs = rng.integers(1, cam.height - 1, n)
    zs = rng.uniform(*z_range, n)
    pts = np.stack(
        [(us - cam.cx) * zs / cam.fx, (vs - cam.cy) * zs / cam.fy, zs], axis=1
    ).astype(np.float32)
    cols = rng.uniform(30, 220, size=(n, 3)).astype(np.float32)
    return pts, cols


def test_pose_gradient_through_prefilter():
    cam = Camera.from_params(30.0, 30.0, 16.0, 16.0, 32, 32)
    pts, cols = pixel_center_scene(cam, n=50, seed=1)
    E = np.eye(4, dtype=np.float32)

    def loss_tz(tz):
        E2 = jnp.asarray(E).at[2, 3].set(tz)
        M = jnp.asarray(cam.intrinsics4(), jnp.float32) @ E2
        out = render_filtered_diff(
            jnp.asarray(pts), jnp.asarray(cols), M, width=32, height=32, levels=3
        )
        # depth channel of the packed tensor responds smoothly to tz
        return jnp.sum(out["unet_input"][..., 4] ** 2)

    g = jax.grad(loss_tz)(jnp.float32(0.0))
    eps = 1e-3
    fd = (float(loss_tz(jnp.float32(eps))) - float(loss_tz(jnp.float32(-eps)))) / (2 * eps)
    # piecewise-smooth path: allow modest FD tolerance
    np.testing.assert_allclose(fd, float(g), rtol=0.08, atol=1e-3)


def test_full_diff_grads_reach_everything():
    cam = Camera.from_params(30.0, 30.0, 16.0, 16.0, 32, 32)
    pts, cols = pixel_center_scene(cam, n=80, seed=2)
    unet = UNet(features=(4, 8), dtype=jnp.float32)
    _, variables = init_unet(jax.random.PRNGKey(0), 32, 32, features=(4, 8))
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    target = jnp.zeros((32, 32, 3), jnp.float32)

    def loss(params, p, c, Mv):
        y = render_full_diff(
            p, c, Mv, unet,
            {"params": params, "batch_stats": variables["batch_stats"]},
            width=32, height=32, levels=3,
        )
        return jnp.mean((y - target) ** 2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(
        variables["params"], jnp.asarray(pts), jnp.asarray(cols), M
    )
    g_params, g_pts, g_cols, g_M = grads
    assert any(float(jnp.abs(g).sum()) > 0 for g in jax.tree.leaves(g_params))
    assert float(jnp.abs(g_cols).sum()) > 0
    assert float(jnp.abs(g_pts).sum()) > 0  # via depth channel
    assert float(jnp.abs(g_M).sum()) > 0
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def test_pose_refinement_converges():
    """Recover a camera z-offset by gradient descent on the raster depth
    (the pose-optimization capability the differentiable raster enables)."""
    cam = Camera.from_params(30.0, 30.0, 16.0, 16.0, 32, 32)
    pts, cols = pixel_center_scene(cam, n=120, seed=3)
    K4 = jnp.asarray(cam.intrinsics4(), jnp.float32)
    p, c = jnp.asarray(pts), jnp.asarray(cols)

    def render_depth(tz):
        E = jnp.eye(4, dtype=jnp.float32).at[2, 3].set(tz)
        out = rasterize_diff(p, c, K4 @ E, width=32, height=32)
        return jnp.where(out.mask, out.depth, 0.0)

    target = render_depth(jnp.float32(0.0))

    def loss(tz):
        d = render_depth(tz)
        return jnp.mean((d - target) ** 2)

    tz = jnp.float32(0.12)  # initial pose error: 12 cm
    lr = 0.4
    grad_fn = jax.jit(jax.grad(loss))
    for _ in range(60):
        tz = tz - lr * grad_fn(tz)
    assert abs(float(tz)) < 0.01, float(tz)  # recovered within 1 cm
