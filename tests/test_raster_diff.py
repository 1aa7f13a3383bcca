"""Gradient tests for the differentiable raster: finite differences vs
autodiff for colors, point z-positions, and camera pose (BASELINE.md
north-star requirement)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import rasterize
from rtnr_tpu.ops.raster_diff import camera_pose_gradients, rasterize_diff


def make_case(n=2000, w=32, h=32, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 9, n)], axis=1
    ).astype(np.float32)
    cols = rng.uniform(0, 255, size=(n, 3)).astype(np.float32)
    cam = Camera.from_params(30.0, 30.0, w / 2, h / 2, w, h)
    M = cam.cam_proj(np.eye(4)).astype(np.float32)
    return pts, cols, M, cam


def test_forward_matches_hard_raster():
    pts, cols, M, cam = make_case()
    out = rasterize_diff(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
                         width=cam.width, height=cam.height)
    hard_rgb, hard_depth = rasterize(
        jnp.asarray(pts), jnp.asarray(np.round(cols).astype(np.uint8)), jnp.asarray(M),
        width=cam.width, height=cam.height,
    )
    np.testing.assert_array_equal(np.asarray(out.depth), np.asarray(hard_depth))
    # float average vs integer average of rounded colors: within 1 LSB
    got = np.asarray(out.rgb)
    exp = np.asarray(hard_rgb).astype(np.float32)
    assert np.abs(got - exp).max() <= 1.0 + 1e-4


def test_color_gradients_exact():
    pts, cols, M, cam = make_case(n=500)

    g_img = np.random.default_rng(1).normal(size=(cam.height, cam.width, 3)).astype(np.float32)

    def loss(c):
        out = rasterize_diff(jnp.asarray(pts), c, jnp.asarray(M),
                             width=cam.width, height=cam.height)
        return jnp.sum(out.rgb * g_img)

    grad = jax.grad(loss)(jnp.asarray(cols))
    # analytic: in-band point i receives g[pix_i] / count[pix_i]
    out = rasterize_diff(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
                         width=cam.width, height=cam.height)
    # finite-difference spot check on 10 points
    eps = 0.5
    g = np.asarray(grad)
    for i in range(0, 500, 50):
        for ch in range(3):
            c2 = cols.copy()
            c2[i, ch] += eps
            l1 = float(loss(jnp.asarray(c2)))
            c2[i, ch] -= 2 * eps
            l0 = float(loss(jnp.asarray(c2)))
            fd = (l1 - l0) / (2 * eps)
            assert abs(fd - g[i, ch]) < 5e-3, (i, ch, fd, g[i, ch])


def test_depth_gradient_to_point_position():
    # single point -> depth gradient flows to its z through the projection
    cam = Camera.from_params(10, 10, 4, 4, 8, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    pts = np.array([[0.3, -0.2, 5.0]], np.float32)
    cols = np.array([[100.0, 50.0, 25.0]], np.float32)

    def loss(p):
        out = rasterize_diff(p, jnp.asarray(cols), M, width=8, height=8)
        return jnp.sum(jnp.where(out.mask, out.depth, 0.0))

    g = np.asarray(jax.grad(loss)(jnp.asarray(pts)))
    # depth = z => d loss / d p = row 2 of M[:3,:3] = (0,0,1)
    np.testing.assert_allclose(g[0], [0.0, 0.0, 1.0], atol=1e-6)

    # finite difference over z
    eps = 1e-3
    l1 = float(loss(jnp.asarray(pts + [[0, 0, eps]])))
    l0 = float(loss(jnp.asarray(pts - [[0, 0, eps]])))
    np.testing.assert_allclose((l1 - l0) / (2 * eps), g[0, 2], rtol=1e-3)


def test_depth_gradient_many_points_fd():
    pts, cols, M, cam = make_case(n=300, seed=3)

    def loss(p):
        out = rasterize_diff(p, jnp.asarray(cols), jnp.asarray(M),
                             width=cam.width, height=cam.height)
        return jnp.sum(jnp.where(out.mask, out.depth, 0.0) ** 2) * 0.01

    g = np.asarray(jax.grad(loss)(jnp.asarray(pts)))
    # FD along z for a handful of points (z-perturbation keeps pixel
    # assignment fixed; only z-buffer winners have nonzero gradient)
    eps = 1e-3
    checked = 0
    for i in range(0, 300, 23):
        d = np.zeros_like(pts)
        d[i, 2] = eps
        l1 = float(loss(jnp.asarray(pts + d)))
        l0 = float(loss(jnp.asarray(pts - d)))
        fd = (l1 - l0) / (2 * eps)
        if abs(fd - g[i, 2]) < 2e-2 * max(1.0, abs(fd)):
            checked += 1
    assert checked >= 10  # most FD probes agree (ties near band edges may flip)


def test_pose_gradient_through_cam_proj():
    # Points placed exactly at pixel centers: a small pose perturbation
    # cannot flip the (piecewise-constant) pixel assignment, so finite
    # differences see only the smooth depth path.
    cam = Camera.from_params(30.0, 30.0, 16.0, 16.0, 32, 32)
    rng = np.random.default_rng(4)
    us = rng.choice(32, size=40, replace=False if False else True)
    vs = rng.choice(32, size=40)
    zs = rng.uniform(4.0, 8.0, size=40)
    pts = np.stack(
        [(us - 16.0) * zs / 30.0, (vs - 16.0) * zs / 30.0, zs], axis=1
    ).astype(np.float32)
    cols = rng.uniform(0, 255, size=(40, 3)).astype(np.float32)
    K4 = jnp.asarray(cam.intrinsics4(), jnp.float32)

    def loss_M(Mv):
        out = rasterize_diff(jnp.asarray(pts), jnp.asarray(cols), Mv,
                             width=cam.width, height=cam.height)
        return jnp.mean(jnp.where(out.mask, out.depth, 0.0))

    E = np.eye(4, dtype=np.float32)
    dM = jax.grad(loss_M)(jnp.asarray(cam.cam_proj(E), jnp.float32))
    dE = camera_pose_gradients(dM, K4)
    eps = 1e-3

    def loss_E(tz):
        E2 = E.copy()
        E2[2, 3] = tz
        return float(loss_M(jnp.asarray(cam.cam_proj(E2), jnp.float32)))

    fd = (loss_E(eps) - loss_E(-eps)) / (2 * eps)
    np.testing.assert_allclose(fd, float(dE[2, 3]), rtol=5e-2, atol=1e-4)
    assert abs(float(dE[2, 3])) > 0  # gradient actually flows


# ---------------------------------------------------------------------------
# Scalable sort-based variant (custom VJP) — must match the scatter version
# ---------------------------------------------------------------------------
def test_sorted_variant_forward_equivalence():
    from rtnr_tpu.ops.raster_diff import rasterize_diff_sorted

    pts, cols, M, cam = make_case(n=3000, seed=3)
    a = rasterize_diff(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
                       width=cam.width, height=cam.height)
    b = rasterize_diff_sorted(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
                              width=cam.width, height=cam.height)
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    # both formulations are exact in exact arithmetic; f32 prefix sums over
    # the ~4k-element stream differ by O(stream_sum * ulp) ~ 0.05
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), atol=0.15)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))


def test_sorted_variant_gradient_equivalence():
    """Gradients of the custom-VJP path == autodiff of the scatter path,
    for colors, positions, and cam_proj, under a random image cotangent."""
    from rtnr_tpu.ops.raster_diff import rasterize_diff_sorted

    pts, cols, M, cam = make_case(n=800, seed=4)
    rng = np.random.default_rng(5)
    g_rgb = rng.normal(size=(cam.height, cam.width, 3)).astype(np.float32)
    g_dep = rng.normal(size=(cam.height, cam.width)).astype(np.float32)
    # clip depth cotangent at empty pixels (DEPTH_EMPTY is not differentiable
    # target data); both impls zero it there, keep the comparison clean
    def loss(fn, p, c, m):
        out = fn(p, c, m, width=cam.width, height=cam.height)
        return jnp.sum(out.rgb * g_rgb) + jnp.sum(
            jnp.where(out.mask, out.depth, 0.0) * g_dep
        )

    ga = jax.grad(lambda p, c, m: loss(rasterize_diff, p, c, m), argnums=(0, 1, 2))(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M)
    )
    gb = jax.grad(lambda p, c, m: loss(rasterize_diff_sorted, p, c, m), argnums=(0, 1, 2))(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M)
    )
    for a, b, name, tol in zip(ga, gb, ("points", "colors", "cam_proj"), (1e-4, 1e-5, 2e-3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol, err_msg=name)


def test_sorted_variant_fd_depth_gradient():
    """Finite-difference check of d depth / d z through the sorted VJP."""
    from rtnr_tpu.ops.raster_diff import rasterize_diff_sorted

    pts, cols, M, cam = make_case(n=300, seed=6)
    g_dep = np.random.default_rng(7).normal(size=(cam.height, cam.width)).astype(np.float32)

    def loss(p):
        out = rasterize_diff_sorted(p, jnp.asarray(cols), jnp.asarray(M),
                                    width=cam.width, height=cam.height)
        return jnp.sum(jnp.where(out.mask, out.depth, 0.0) * g_dep)

    g = np.asarray(jax.grad(loss)(jnp.asarray(pts)))
    base = float(loss(jnp.asarray(pts)))
    eps = 1e-3
    checked = 0
    for i in range(0, 300, 23):
        p2 = pts.copy()
        p2[i, 2] += eps
        fd = (float(loss(jnp.asarray(p2))) - base) / eps
        # skip points whose perturbation flips a head/band decision
        if abs(fd) > 50:
            continue
        np.testing.assert_allclose(g[i, 2], fd, atol=2e-2)
        checked += 1
    assert checked >= 8


def test_sorted_variant_with_valid_mask():
    from rtnr_tpu.ops.raster_diff import rasterize_diff_sorted

    pts, cols, M, cam = make_case(n=1000, seed=8)
    valid = np.random.default_rng(9).random(1000) < 0.7
    a = rasterize_diff(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
                       width=cam.width, height=cam.height, valid=jnp.asarray(valid))
    b = rasterize_diff_sorted(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M),
                              width=cam.width, height=cam.height, valid=jnp.asarray(valid))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), atol=0.15)

    # masked-out points must receive zero gradient
    def loss(c):
        out = rasterize_diff_sorted(jnp.asarray(pts), c, jnp.asarray(M),
                                    width=cam.width, height=cam.height,
                                    valid=jnp.asarray(valid))
        return jnp.sum(out.rgb)

    g = np.asarray(jax.grad(loss)(jnp.asarray(cols)))
    assert np.all(g[~valid] == 0.0)
