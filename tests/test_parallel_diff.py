"""Sharded differentiable raster: multi-chip scene/pose gradients.

BASELINE.json config 4 / VERDICT r2 item 3: the raster custom-VJP must merge
over the mesh — forward bit-equivalent to the single-device differentiable
raster, gradients (points, colors, camera pose) equal to the unsharded VJP,
and pose gradients finite-difference-verified on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster_diff import rasterize_diff_sorted
from rtnr_tpu.parallel import make_mesh
from rtnr_tpu.parallel.diff import (
    rasterize_diff_point_sharded,
    rasterize_diff_sharded_batch,
)


def make_case(n=2048, w=32, h=32, seed=0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(3, 9, n)], axis=1
    ).astype(np.float32)
    cols = rng.uniform(0, 255, size=(n, 3)).astype(np.float32)
    cam = Camera.from_params(30.0, 30.0, w / 2, h / 2, w, h)
    M = cam.cam_proj(np.eye(4)).astype(np.float32)
    return jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(M), cam


def test_forward_matches_single_device():
    pts, cols, M, cam = make_case()
    mesh = make_mesh((1, 8))
    a = rasterize_diff_point_sharded(
        pts, cols, M, mesh, width=cam.width, height=cam.height
    )
    b = rasterize_diff_sorted(pts, cols, M, width=cam.width, height=cam.height)
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))
    np.testing.assert_array_equal(np.asarray(a.count), np.asarray(b.count))
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    # f32 sums accumulate in different orders across shards
    np.testing.assert_allclose(np.asarray(a.rgb), np.asarray(b.rgb), atol=0.05)


def test_gradients_match_unsharded():
    pts, cols, M, cam = make_case(n=1024, seed=2)
    mesh = make_mesh((1, 8))
    rng = np.random.default_rng(3)
    g_rgb = jnp.asarray(rng.normal(size=(cam.height, cam.width, 3)), jnp.float32)
    g_dep = jnp.asarray(rng.normal(size=(cam.height, cam.width)), jnp.float32)

    def loss(fn, p, c, m):
        out = fn(p, c, m, width=cam.width, height=cam.height)
        return jnp.sum(out.rgb * g_rgb) + jnp.sum(
            jnp.where(out.mask, out.depth, 0.0) * g_dep
        )

    sharded = lambda p, c, m, **kw: rasterize_diff_point_sharded(p, c, m, mesh, **kw)
    ga = jax.grad(lambda p, c, m: loss(rasterize_diff_sorted, p, c, m), argnums=(0, 1, 2))(
        pts, cols, M
    )
    gb = jax.grad(lambda p, c, m: loss(sharded, p, c, m), argnums=(0, 1, 2))(
        pts, cols, M
    )
    for a, b, name, tol in zip(ga, gb, ("points", "colors", "cam_proj"), (1e-4, 1e-5, 2e-3)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=tol, err_msg=name)


def test_depth_gradient_owned_by_exactly_one_shard():
    """Two shards hold the same pixel; the global-min point sits on shard 1
    and a tied-depth duplicate on shard 5 — the depth cotangent must flow to
    exactly one of them (sum preserved), never both."""
    cam = Camera.from_params(10, 10, 4, 4, 8, 8)
    M = jnp.asarray(cam.cam_proj(np.eye(4)), jnp.float32)
    # 8 points, one per shard, all projecting to the center pixel; two share
    # the exact minimum depth
    zs = [5.0, 2.0, 5.0, 5.0, 5.0, 2.0, 5.0, 5.0]
    pts = jnp.asarray(np.array([[0, 0, z] for z in zs], np.float32))
    cols = jnp.asarray(np.full((8, 3), 100.0, np.float32))
    mesh = make_mesh((1, 8))

    def loss(p):
        out = rasterize_diff_point_sharded(p, cols, M, mesh, width=8, height=8)
        return jnp.sum(jnp.where(out.mask, out.depth, 0.0))

    g = np.asarray(jax.grad(loss)(pts))
    # d depth / d z = 1 for exactly one of the two tied minima
    receivers = [i for i in (1, 5) if abs(g[i, 2] - 1.0) < 1e-6]
    assert len(receivers) == 1, g[:, 2]
    others = [i for i in range(8) if i not in receivers]
    assert np.allclose(g[others, 2], 0.0), g[:, 2]


def test_pose_gradient_fd_on_mesh():
    """Finite-difference check of d(loss)/d(pose tz) through the sharded VJP
    (the north-star pose-gradient requirement, run on the 8-device mesh)."""
    cam = Camera.from_params(30.0, 30.0, 16.0, 16.0, 32, 32)
    rng = np.random.default_rng(4)
    # points at exact pixel centers: pose perturbation can't flip the
    # piecewise-constant pixel assignment (same construction as the
    # single-device FD test)
    us = rng.choice(32, size=64)
    vs = rng.choice(32, size=64)
    zs = rng.uniform(4.0, 8.0, size=64)
    pts = np.stack(
        [(us - 16.0) * zs / 30.0, (vs - 16.0) * zs / 30.0, zs], axis=1
    ).astype(np.float32)
    cols = jnp.asarray(rng.uniform(0, 255, size=(64, 3)).astype(np.float32))
    mesh = make_mesh((1, 8))
    E = np.eye(4, dtype=np.float32)

    def loss_M(Mv):
        out = rasterize_diff_point_sharded(
            jnp.asarray(pts), cols, Mv, mesh, width=cam.width, height=cam.height
        )
        return jnp.mean(jnp.where(out.mask, out.depth, 0.0))

    dM = jax.grad(loss_M)(jnp.asarray(cam.cam_proj(E), jnp.float32))
    K4 = jnp.asarray(cam.intrinsics4(), jnp.float32)
    from rtnr_tpu.ops.raster_diff import camera_pose_gradients

    dE = camera_pose_gradients(dM, K4)

    eps = 1e-3

    def loss_E(tz):
        E2 = E.copy()
        E2[2, 3] = tz
        return float(loss_M(jnp.asarray(cam.cam_proj(E2), jnp.float32)))

    fd = (loss_E(eps) - loss_E(-eps)) / (2 * eps)
    np.testing.assert_allclose(fd, float(dE[2, 3]), rtol=5e-2, atol=1e-4)
    assert abs(float(dE[2, 3])) > 0


def test_batched_sharded_matches_per_frame():
    """(batch=2, points=4) mesh: the batched sharded raster equals the
    single-frame sharded raster per frame, and point/color grads sum over
    frames."""
    pts, cols, M, cam = make_case(n=1024, seed=5)
    mesh = make_mesh((2, 4))
    M2 = jnp.asarray(np.asarray(M) @ np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32))
    M2 = M2.at[0, 3].add(1.5)
    Ms = jnp.stack([M, M2])

    out = rasterize_diff_sharded_batch(
        pts, cols, Ms, mesh, width=cam.width, height=cam.height
    )
    assert out.rgb.shape == (2, cam.height, cam.width, 3)
    for f, Mi in enumerate([M, M2]):
        ref = rasterize_diff_sorted(pts, cols, Mi, width=cam.width, height=cam.height)
        np.testing.assert_array_equal(np.asarray(out.depth[f]), np.asarray(ref.depth))
        np.testing.assert_allclose(np.asarray(out.rgb[f]), np.asarray(ref.rgb), atol=0.05)

    g_rgb = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, cam.height, cam.width, 3)), jnp.float32
    )

    def loss_b(c):
        o = rasterize_diff_sharded_batch(pts, c, Ms, mesh, width=cam.width, height=cam.height)
        return jnp.sum(o.rgb * g_rgb)

    def loss_1(c):
        s = 0.0
        for f, Mi in enumerate([M, M2]):
            o = rasterize_diff_sorted(pts, c, Mi, width=cam.width, height=cam.height)
            s = s + jnp.sum(o.rgb * g_rgb[f])
        return s

    ga = jax.grad(loss_b)(cols)
    gb = jax.grad(loss_1)(cols)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), atol=1e-5)


def test_sharded_compact_forward_bit_identical(monkeypatch):
    """The sharded forward's compact path (production compact+expand
    kernels, RTNR_DIFF_FWD=compact on TPU) is bit-identical to the
    carrier-sort path — images and gradients."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.parallel import diff as pdiff
    from rtnr_tpu.parallel.mesh import make_mesh
    from rtnr_tpu.scene import Scene

    scene = Scene.synthetic(16_000, seed=0, extent=6.0)
    p, c, v = scene.device_arrays(16)
    cam = Camera.from_params(60, 60, 32, 24, 64, 48)
    E = np.eye(4)
    E[2, 3] = 8.0
    M = jnp.asarray(cam.cam_proj(E), jnp.float32)
    mesh = make_mesh((8,), ("points",))
    pts = jnp.asarray(p)
    cols = jnp.asarray(c).astype(jnp.float32)
    val = jnp.asarray(v)

    def run():
        out = pdiff.rasterize_diff_point_sharded(
            pts, cols, M, mesh, width=64, height=48, valid=val
        )
        return jax.tree.map(np.asarray, out)

    def grads():
        def loss(pp, cc, MM):
            o = pdiff.rasterize_diff_point_sharded(
                pp, cc, MM, mesh, width=64, height=48, valid=val
            )
            return (jnp.sum(o.rgb * 0.001)
                    + jnp.sum(jnp.where(o.mask, o.depth, 0.0)) * 1e-6)

        return jax.grad(loss, argnums=(0, 1, 2))(pts, cols, M)

    monkeypatch.setenv("RTNR_DIFF_FWD", "sort")
    a, ga = run(), grads()
    monkeypatch.setenv("RTNR_DIFF_FWD", "compact_interpret")
    b, gb = run(), grads()
    for f in ("rgb", "depth", "count", "mask"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f))
    for x, y in zip(ga, gb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
