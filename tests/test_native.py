"""Native C++ ingest: PLY fast path parity + .oct reference-format interop."""

import struct

import numpy as np
import pytest

from rtnr_tpu.data import native
from rtnr_tpu.data.ply import _read_ply_py, read_ply, write_ply
from rtnr_tpu.scene import Scene

pytestmark = pytest.mark.skipif(
    not (native.available() or native.build()), reason="native lib not built"
)


def test_native_ply_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 3)).astype(np.float32)
    cols = rng.integers(0, 256, (5000, 3), dtype=np.uint8)
    f = tmp_path / "c.ply"
    write_ply(f, pts, cols, binary=True)
    got = native.read_ply_native(f)
    assert got is not None
    np.testing.assert_array_equal(got[0], pts)
    np.testing.assert_array_equal(got[1], cols)
    # and read_ply() dispatches to the same result
    p2, c2 = read_ply(f)
    np.testing.assert_array_equal(p2, pts)
    np.testing.assert_array_equal(c2, cols)


def test_native_ply_ascii_falls_back(tmp_path):
    pts = np.array([[1, 2, 3]], np.float32)
    f = tmp_path / "a.ply"
    write_ply(f, pts, None, binary=False)
    assert native.read_ply_native(f) is None  # ascii -> python path
    p, c = read_ply(f)
    np.testing.assert_allclose(p, pts)


def test_oct_roundtrip(tmp_path):
    scene = Scene.synthetic(3000, seed=1, extent=2.0)
    f = tmp_path / "pcd.oct"
    assert scene.save_oct(f)
    back = Scene.from_oct(f)
    assert back.n_points == scene.n_points
    # same point/color/key multiset (block order may differ from input order)
    a = np.lexsort(scene.points.T)
    b = np.lexsort(back.points.T)
    np.testing.assert_allclose(scene.points[a], back.points[b], atol=1e-6)
    np.testing.assert_array_equal(scene.colors[a], back.colors[b])
    np.testing.assert_array_equal(scene.block_keys[a], back.block_keys[b])
    assert back.num_blocks == scene.num_blocks


def test_oct_layout_is_reference_bit_format(tmp_path):
    """Byte-level check against the layout of reference Octreegrid.h:53-79."""
    pts = np.array([[0.1, 0.1, 0.1], [0.12, 0.1, 0.1]], np.float32)
    cols = np.array([[1, 2, 3], [4, 5, 6]], np.uint8)
    scene = Scene.from_arrays(pts, cols)
    f = tmp_path / "pcd.oct"
    assert scene.save_oct(f)
    raw = f.read_bytes()
    nx, ny, nz, nblocks = struct.unpack("<4i", raw[:16])
    assert (nx, ny, nz) == scene.num_blocks
    assert nblocks == 1
    key, npts = struct.unpack("<iQ", raw[16:28])
    assert key == scene.block_keys[0]
    assert npts == 2
    got_pts = np.frombuffer(raw[28 : 28 + 24], np.float32).reshape(2, 3)
    np.testing.assert_array_equal(got_pts, pts)
    got_cols = np.frombuffer(raw[52:58], np.uint8).reshape(2, 3)
    np.testing.assert_array_equal(got_cols, cols)
    bb = np.frombuffer(raw[58 : 58 + 24], np.float32)
    lo, hi = scene.block_bounds(np.array([key]))
    np.testing.assert_allclose(bb[:3], lo[0])
    np.testing.assert_allclose(bb[3:], hi[0])
    assert len(raw) == 58 + 24


def test_native_ply_with_extra_props(tmp_path):
    # binary PLY with intensity between position and color
    n = 3
    header = (
        "ply\nformat binary_little_endian 1.0\n"
        f"element vertex {n}\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float intensity\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
    ).encode()
    rows = b""
    for i in range(n):
        rows += struct.pack("<ffffBBB", i, i + 0.5, i + 1.0, 0.9, i, i + 10, i + 20)
    f = tmp_path / "e.ply"
    f.write_bytes(header + rows)
    got = native.read_ply_native(f)
    assert got is not None
    np.testing.assert_allclose(got[0][:, 1], [0.5, 1.5, 2.5])
    np.testing.assert_array_equal(got[1][:, 2], [20, 21, 22])
    # python reader agrees
    p, c = _read_ply_py(f)
    np.testing.assert_allclose(got[0], p)
    np.testing.assert_array_equal(got[1], c)
