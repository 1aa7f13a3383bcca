"""Frustum culling correctness: culled render == uncalled render."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.culling import (
    build_block_index,
    compact_points,
    cull_points,
    visible_blocks,
)
from rtnr_tpu.ops.raster import rasterize
from rtnr_tpu.scene import Scene


@pytest.fixture(scope="module")
def setup():
    # points spread widely so many blocks fall outside a narrow frustum
    scene = Scene.synthetic(30_000, seed=0, extent=40.0)
    cam = Camera.from_params(100, 100, 32, 32, 64, 64)
    E = np.eye(4)
    E[2, 3] = 25.0
    pts, cols, valid = scene.sorted_by_block().device_arrays(8)
    M = jnp.asarray(cam.cam_proj(E), jnp.float32)
    return scene, cam, pts, cols, valid, M


def test_visible_blocks_conservative(setup):
    scene, cam, pts, cols, valid, M = setup
    idx = build_block_index(scene, pad_to_multiple=8)
    vis = visible_blocks(idx.corners, M, cam.width, cam.height)
    # narrow frustum over a wide scene: a solid fraction must be culled
    frac = float(np.mean(np.asarray(vis)))
    assert frac < 0.9
    assert frac > 0.0


def test_culled_render_identical(setup):
    scene, cam, pts, cols, valid, M = setup
    idx = build_block_index(scene, pad_to_multiple=8)
    keep = cull_points(idx, M, jnp.asarray(valid), width=cam.width, height=cam.height)
    base_rgb, base_d = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), M, width=cam.width, height=cam.height,
        valid=jnp.asarray(valid),
    )
    cull_rgb, cull_d = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), M, width=cam.width, height=cam.height,
        valid=keep,
    )
    np.testing.assert_array_equal(np.asarray(base_d), np.asarray(cull_d))
    np.testing.assert_array_equal(np.asarray(base_rgb), np.asarray(cull_rgb))


def test_compacted_render_identical(setup):
    scene, cam, pts, cols, valid, M = setup
    idx = build_block_index(scene, pad_to_multiple=8)
    keep = cull_points(idx, M, jnp.asarray(valid), width=cam.width, height=cam.height)
    n_keep = int(np.asarray(keep).sum())
    budget = ((n_keep + 1023) // 1024) * 1024
    cpts, ccols, cvalid = compact_points(jnp.asarray(pts), jnp.asarray(cols), keep, budget)
    base_rgb, base_d = rasterize(
        jnp.asarray(pts), jnp.asarray(cols), M, width=cam.width, height=cam.height,
        valid=jnp.asarray(valid),
    )
    got_rgb, got_d = rasterize(
        cpts, ccols, M, width=cam.width, height=cam.height, valid=cvalid
    )
    np.testing.assert_array_equal(np.asarray(base_d), np.asarray(got_d))
    np.testing.assert_array_equal(np.asarray(base_rgb), np.asarray(got_rgb))


def test_compact_overflow_drops(setup):
    scene, cam, pts, cols, valid, M = setup
    keep = jnp.asarray(valid)
    cpts, ccols, cvalid = compact_points(jnp.asarray(pts), jnp.asarray(cols), keep, 100)
    assert int(cvalid.sum()) == 100  # clipped at budget


# ---------------------------------------------------------------------------
# Renderer-integrated culling (cached compaction)
# ---------------------------------------------------------------------------
def test_renderer_culled_equals_full_room():
    """A camera inside a room sees a strict subset of blocks; the culled
    render must be bit-identical to the full render (generous budget)."""
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.pipeline import Renderer

    scene = Scene.synthetic_room(60_000, seed=3)
    cam = Camera.from_params(80.0, 80.0, 48, 32, 96, 64)
    # camera near a corner looking across the room
    E = np.eye(4)
    E[2, 3] = 4.0
    E[0, 3] = 1.0

    full = Renderer(scene)
    culled = Renderer(scene, cull_budget=60_000)
    a = full.compute_rgbd(cam, E)
    b = culled.compute_rgbd(cam, E)
    np.testing.assert_array_equal(a["depth"], b["depth"])
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    # culling actually removed something on this scene
    assert culled._cull_cache["n_kept"] < scene.n_points


def test_renderer_cull_cache_reuse_and_invalidation():
    """Within the inflate radius the compaction is reused (and stays exact);
    beyond it, it recomputes."""
    from rtnr_tpu.camera import Camera
    from rtnr_tpu.pipeline import Renderer

    scene = Scene.synthetic_room(40_000, seed=4)
    cam = Camera.from_params(80.0, 80.0, 48, 32, 96, 64)
    full = Renderer(scene)
    culled = Renderer(scene, cull_budget=40_000, cull_inflate_m=0.5)

    E = np.eye(4)
    E[2, 3] = 3.5
    culled.compute_rgbd(cam, E)
    cache0 = culled._cull_cache
    # small translation: reuse
    E2 = E.copy()
    E2[0, 3] += 0.2  # camera center moves 0.2 m < 0.5 m
    a = full.compute_rgbd(cam, E2)
    b = culled.compute_rgbd(cam, E2)
    assert culled._cull_cache is cache0  # reused
    np.testing.assert_array_equal(a["depth"], b["depth"])
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    # big translation: recompute, still exact
    E3 = E.copy()
    E3[0, 3] += 2.0
    a = full.compute_rgbd(cam, E3)
    b = culled.compute_rgbd(cam, E3)
    assert culled._cull_cache is not cache0
    np.testing.assert_array_equal(a["depth"], b["depth"])
    np.testing.assert_array_equal(a["rgb"], b["rgb"])


def test_compact_points_sort_based():
    """Sort-based compaction keeps exactly the masked points, in order."""
    rng = np.random.default_rng(5)
    n = 1000
    pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    keep = rng.random(n) < 0.3
    import jax.numpy as jnp

    out_p, out_c, out_v = compact_points(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(keep), 512
    )
    k = int(keep.sum())
    assert int(np.asarray(out_v).sum()) == k
    np.testing.assert_array_equal(np.asarray(out_p)[:k], pts[keep])
    np.testing.assert_array_equal(np.asarray(out_c)[:k], cols[keep])
    # overflow: budget smaller than kept count drops the tail
    out_p2, _, out_v2 = compact_points(
        jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(keep), 100
    )
    assert int(np.asarray(out_v2).sum()) == 100
    np.testing.assert_array_equal(np.asarray(out_p2), pts[keep][:100])


def test_renderer_overflow_falls_back_to_full_cloud():
    """A fixed budget smaller than the view's kept count must NOT drop
    points: the renderer renders the exact full cloud for that region."""
    from rtnr_tpu.camera import Camera
    from rtnr_tpu.pipeline import Renderer

    scene = Scene.synthetic_room(40_000, seed=6)
    cam = Camera.from_params(80.0, 80.0, 48, 32, 96, 64)
    E = np.eye(4)
    E[2, 3] = 3.5

    full = Renderer(scene)
    tiny = Renderer(scene, cull_budget=64)  # guaranteed overflow
    a = full.compute_rgbd(cam, E)
    b = tiny.compute_rgbd(cam, E)
    assert tiny._cull_cache["overflowed"]
    assert tiny._cull_cache["n_kept"] > 64
    np.testing.assert_array_equal(a["depth"], b["depth"])
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
    # the fallback decision is cached like a normal compaction
    cache0 = tiny._cull_cache
    tiny.compute_rgbd(cam, E)
    assert tiny._cull_cache is cache0


def test_renderer_auto_budget():
    """cull_budget='auto' sizes the budget from the first view's kept
    count (1.5x, padded) and stays bit-exact vs the full render."""
    from rtnr_tpu.camera import Camera
    from rtnr_tpu.pipeline import Renderer

    scene = Scene.synthetic_room(40_000, seed=7)
    cam = Camera.from_params(80.0, 80.0, 48, 32, 96, 64)
    E = np.eye(4)
    E[2, 3] = 3.5

    full = Renderer(scene)
    auto = Renderer(scene, cull_budget="auto", pad_points_to=1024)
    a = full.compute_rgbd(cam, E)
    b = auto.compute_rgbd(cam, E)
    n_kept = auto._cull_cache["n_kept"]
    assert not auto._cull_cache["overflowed"]
    assert auto.cull_budget >= n_kept
    assert auto.cull_budget <= max(-(-int(1.5 * n_kept) // 1024) * 1024, 1024)
    np.testing.assert_array_equal(a["depth"], b["depth"])
    np.testing.assert_array_equal(a["rgb"], b["rgb"])
