"""PLY round-trips + E57 scan assembly tests."""

import numpy as np
import pytest

from rtnr_tpu.data.e57 import assemble_scan, normalize_colors, spherical_to_cartesian
from rtnr_tpu.data.ply import read_ply, write_ply
from rtnr_tpu.scene import Scene


def rand_cloud(n=1000, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
    return pts, cols


@pytest.mark.parametrize("binary", [True, False])
def test_ply_roundtrip(tmp_path, binary):
    pts, cols = rand_cloud()
    f = tmp_path / "c.ply"
    write_ply(f, pts, cols, binary=binary)
    p2, c2 = read_ply(f)
    np.testing.assert_allclose(p2, pts, rtol=1e-6)
    np.testing.assert_array_equal(c2, cols)


def test_ply_no_color(tmp_path):
    pts, _ = rand_cloud()
    f = tmp_path / "c.ply"
    write_ply(f, pts, None)
    p2, c2 = read_ply(f)
    np.testing.assert_allclose(p2, pts, rtol=1e-6)
    assert c2 is None


def test_ply_extra_props_skipped(tmp_path):
    # vertex with extra intensity property + a face element after
    f = tmp_path / "x.ply"
    body = "\n".join(
        [
            "ply", "format ascii 1.0",
            "element vertex 2",
            "property float x", "property float y", "property float z",
            "property float intensity",
            "property uchar red", "property uchar green", "property uchar blue",
            "element face 1",
            "property list uchar int vertex_indices",
            "end_header",
            "1 2 3 0.5 10 20 30",
            "4 5 6 0.7 40 50 60",
            "3 0 1 0",
        ]
    )
    f.write_text(body + "\n")
    pts, cols = read_ply(f)
    np.testing.assert_allclose(pts, [[1, 2, 3], [4, 5, 6]])
    np.testing.assert_array_equal(cols, [[10, 20, 30], [40, 50, 60]])


def test_ply_bad_magic(tmp_path):
    f = tmp_path / "bad.ply"
    f.write_bytes(b"noply\n")
    with pytest.raises(ValueError, match="magic"):
        read_ply(f)


def test_scene_from_ply_with_cache(tmp_path):
    pts, cols = rand_cloud(500, seed=1)
    f = tmp_path / "cloud.ply"
    write_ply(f, pts, cols)
    cache = tmp_path / "cache"
    s1 = Scene.from_file(f, cache_dir=cache)
    assert (cache / "pcd.npz").exists()
    # cache hit path
    s2 = Scene.from_file(tmp_path / "nonexistent.ply", cache_dir=cache)
    np.testing.assert_array_equal(s1.points, s2.points)


def test_spherical_to_cartesian():
    # azimuth 0, elevation 0, range 5 -> (5, 0, 0)
    out = spherical_to_cartesian(np.array([0.0]), np.array([0.0]), np.array([5.0]))
    np.testing.assert_allclose(out, [[5, 0, 0]], atol=1e-12)
    # elevation pi/2 -> straight up
    out = spherical_to_cartesian(np.array([0.0]), np.array([np.pi / 2]), np.array([2.0]))
    np.testing.assert_allclose(out, [[0, 0, 2]], atol=1e-12)


def test_normalize_colors_per_channel_ranges():
    lims = {
        "colorRedMinimum": 0.0, "colorRedMaximum": 1023.0,
        "colorGreenMinimum": 0.0, "colorGreenMaximum": 255.0,
        "colorBlueMinimum": 100.0, "colorBlueMaximum": 200.0,
    }
    out = normalize_colors(
        np.array([1023.0]), np.array([255.0]), np.array([150.0]), lims
    )
    # each channel normalized by its own range (reference bug fixed)
    np.testing.assert_array_equal(out, [[255, 255, 127]])


def test_assemble_scan_cartesian_invalid_and_pose():
    scan = {
        "cartesianX": np.array([1.0, 2.0, 3.0]),
        "cartesianY": np.zeros(3),
        "cartesianZ": np.zeros(3),
        "cartesianInvalidState": np.array([0, 1, 0]),
        "pose": (1, 0, 0, 0, 10.0, 0.0, 0.0),  # translate +10x
    }
    pts, cols = assemble_scan(scan)
    np.testing.assert_allclose(pts, [[11, 0, 0], [13, 0, 0]], atol=1e-6)
    assert cols.shape == (2, 3)  # filtered alongside positions


def test_assemble_scan_spherical():
    scan = {
        "sphericalAzimuth": np.array([0.0, np.pi]),
        "sphericalElevation": np.array([0.0, 0.0]),
        "sphericalRange": np.array([1.0, 2.0]),
        "sphericalInvalidState": np.array([0, 0]),
    }
    pts, _ = assemble_scan(scan)
    np.testing.assert_allclose(pts, [[1, 0, 0], [-2, 0, 0]], atol=1e-6)


def test_assemble_scan_skip_decimation():
    scan = {"cartesianX": np.arange(1000.0), "cartesianY": np.zeros(1000), "cartesianZ": np.zeros(1000)}
    pts, _ = assemble_scan(scan, skip=4)
    assert 200 < pts.shape[0] < 600  # ~1000 / E[stride 1..4 = 2.5]
