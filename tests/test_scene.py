"""Scene grid, cache, and downsample tests (reference Octreegrid.h /
cloudreader.cpp semantics)."""

import numpy as np

from rtnr_tpu.scene import Scene


def test_grid_keys_and_bounds():
    pts = np.array(
        [[0.1, 0.1, 0.1], [0.9, 0.1, 0.1], [0.1, 0.9, 0.9]], np.float32
    )
    s = Scene.from_arrays(pts)
    # AABB rounds to [0,1]^3 -> 4 blocks per axis at 0.25 m
    assert s.num_blocks == (4, 4, 4)
    np.testing.assert_allclose(s.bb_min, [0, 0, 0])
    np.testing.assert_allclose(s.bb_max, [1, 1, 1])
    # keys: x + y*nx + z*nx*ny
    assert s.block_keys[0] == 0
    assert s.block_keys[1] == 3
    assert s.block_keys[2] == 0 + 3 * 4 + 3 * 16
    lo, hi = s.block_bounds(np.array([s.block_keys[1]]))
    np.testing.assert_allclose(lo[0], [0.75, 0, 0])
    np.testing.assert_allclose(hi[0], [1.0, 0.25, 0.25])


def test_decode_key_roundtrip():
    s = Scene.synthetic(1000, seed=1)
    xyz = s.decode_key(s.block_keys)
    nx, ny, nz = s.num_blocks
    keys = xyz[:, 0] + xyz[:, 1] * nx + xyz[:, 2] * nx * ny
    np.testing.assert_array_equal(keys, s.block_keys)
    assert xyz[:, 0].max() < nx and xyz[:, 1].max() < ny and xyz[:, 2].max() < nz


def test_cache_roundtrip(tmp_path):
    s = Scene.synthetic(5000, seed=2)
    s.save_cache(tmp_path)
    s2 = Scene.load_cache(tmp_path)
    np.testing.assert_array_equal(s.points, s2.points)
    np.testing.assert_array_equal(s.colors, s2.colors)
    np.testing.assert_array_equal(s.block_keys, s2.block_keys)
    assert s.num_blocks == s2.num_blocks


def test_downsample_counts():
    # dense cloud (few blocks, many points per block) so per-block
    # truncation noise is negligible
    s = Scene.synthetic(10000, seed=3, extent=1.0)
    d = s.downsample(0.5, seed=0)
    # per-block: size - int(size*0.5) points kept
    assert 0.45 * s.n_points < d.n_points <= 0.62 * s.n_points
    # kept points are a subset of the original cloud
    orig = {tuple(p) for p in s.points[:100]}  # spot check
    assert all(tuple(p) in {tuple(q) for q in s.points} for p in d.points[:10])


def test_sorted_by_block_groups_keys():
    s = Scene.synthetic(3000, seed=4).sorted_by_block()
    assert np.all(np.diff(s.block_keys) >= 0)


def test_device_arrays_padding():
    s = Scene.synthetic(1001, seed=5)
    pts, cols, valid = s.device_arrays(pad_to_multiple=256)
    assert pts.shape[0] % 256 == 0
    assert valid.sum() == 1001
    assert not valid[-1]


def test_empty_scene():
    s = Scene.from_arrays(np.zeros((0, 3), np.float32))
    assert s.n_points == 0
