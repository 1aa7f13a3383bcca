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


# ---------------------------------------------------------------------------
# Native E57 container (cpp/rtnr_e57.cpp <-> data/e57_write.py)
# ---------------------------------------------------------------------------
def _native_e57_or_skip():
    from rtnr_tpu.data import native

    if not native.available():
        native.build()
    if not native.available() or not hasattr(native._load(), "e57_open"):
        pytest.skip("native ingest library unavailable")


def _jpeg_bytes(rgb):
    import io

    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(rgb, "RGB").save(b, "JPEG", quality=95)
    return b.getvalue()


def test_e57_native_roundtrip_scaled_int(tmp_path):
    """ScaledInteger coords + Integer colors + invalid mask + pose."""
    _native_e57_or_skip()
    from rtnr_tpu.camera import pose_from_quat_trans
    from rtnr_tpu.data.e57 import E57Reader
    from rtnr_tpu.data.e57_write import scan_from_arrays, write_e57

    rng = np.random.default_rng(1)
    n = 3000
    pts = rng.uniform(-4, 4, (n, 3))
    cols = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    inv = (rng.random(n) < 0.2).astype(np.int64)
    pose = (0.9238795325112867, 0.0, 0.3826834323650898, 0.0, 1.0, -2.0, 3.0)
    f = tmp_path / "a.e57"
    write_e57(f, [scan_from_arrays(pts, cols, pose=pose, invalid=inv)])

    with E57Reader(f) as r:
        assert r.scan_count == 1 and r.image_count == 0
        p, c = r.get_scan_cloud(0)
    P = pose_from_quat_trans(*pose)
    quant = np.rint(pts / 0.0001) * 0.0001
    exp = (quant @ P[:3, :3].T + P[:3, 3])[inv == 0]
    assert p.shape == (int((inv == 0).sum()), 3)
    np.testing.assert_allclose(p, exp, atol=1e-5)
    np.testing.assert_array_equal(c, cols[inv == 0])


def test_e57_native_multipacket_bit_straddle(tmp_path):
    """>64KiB of bytestream data forces multiple packets; 17-bit records
    straddle packet boundaries, exercising the decoder's bit carry."""
    _native_e57_or_skip()
    from rtnr_tpu.data.e57 import read_e57
    from rtnr_tpu.data.e57_write import scan_from_arrays, write_e57

    rng = np.random.default_rng(2)
    n = 120_000  # ~255KB of 17-bit coords per axis
    pts = rng.uniform(-6, 6, (n, 3))
    f = tmp_path / "big.e57"
    write_e57(f, [scan_from_arrays(pts, None)])
    p, c = read_e57(f)
    np.testing.assert_allclose(p, np.rint(pts / 0.0001) * 0.0001, atol=1e-5)
    assert (c == 0).all()


def test_e57_native_float_precisions(tmp_path):
    """Float-single spherical + Float-double cartesian prototypes."""
    _native_e57_or_skip()
    from rtnr_tpu.data.e57 import E57Reader
    from rtnr_tpu.data.e57_write import E57Field, E57Scan, write_e57

    rng = np.random.default_rng(3)
    n = 500
    az, el, rr = rng.uniform(-3, 3, n), rng.uniform(-1.5, 1.5, n), rng.uniform(1, 30, n)
    sph = E57Scan(
        fields=[
            E57Field("sphericalAzimuth", "float", az),
            E57Field("sphericalElevation", "float", el),
            E57Field("sphericalRange", "float", rr),
            E57Field("sphericalInvalidState", "integer", np.zeros(n, np.int64), 0, 2),
        ]
    )
    xyz = rng.uniform(-5, 5, (n, 3))
    cart = E57Scan(
        fields=[
            E57Field("cartesianX", "double", xyz[:, 0]),
            E57Field("cartesianY", "double", xyz[:, 1]),
            E57Field("cartesianZ", "double", xyz[:, 2]),
        ]
    )
    f = tmp_path / "f.e57"
    write_e57(f, [sph, cart])
    with E57Reader(f) as r:
        p0, _ = r.get_scan_cloud(0)
        p1, _ = r.get_scan_cloud(1)
    azf, elf, rrf = az.astype(np.float32), el.astype(np.float32), rr.astype(np.float32)
    exp = np.stack(
        [rrf * np.cos(azf) * np.cos(elf), rrf * np.sin(azf) * np.cos(elf), rrf * np.sin(elf)], 1
    )
    np.testing.assert_allclose(p0, exp, rtol=1e-5)
    np.testing.assert_allclose(p1, xyz, rtol=1e-7)


def test_e57_native_crc_detection(tmp_path):
    """A flipped payload byte must be rejected by the page CRC check."""
    _native_e57_or_skip()
    from rtnr_tpu.data.e57 import E57Reader
    from rtnr_tpu.data.e57_write import scan_from_arrays, write_e57

    f = tmp_path / "crc.e57"
    write_e57(f, [scan_from_arrays(np.zeros((10, 3)), None)])
    raw = bytearray(f.read_bytes())
    raw[1500] ^= 0xFF  # payload byte in page 1
    g = tmp_path / "bad.e57"
    g.write_bytes(bytes(raw))
    with pytest.raises(ValueError, match="CRC"):
        E57Reader(g)
    with pytest.raises(ValueError):
        E57Reader(tmp_path / "missing.e57")


def test_e57_scene_from_file(tmp_path):
    """Scene.from_file('.e57') end-to-end with the native decoder + cache."""
    _native_e57_or_skip()
    from rtnr_tpu.data.e57_write import scan_from_arrays, write_e57

    rng = np.random.default_rng(4)
    pts = rng.uniform(-2, 2, (2000, 3))
    cols = rng.integers(0, 256, (2000, 3), dtype=np.uint8)
    f = tmp_path / "scene.e57"
    write_e57(f, [scan_from_arrays(pts, cols)])
    scene = Scene.from_file(f, cache_dir=tmp_path / "cache")
    assert scene.n_points == 2000
    np.testing.assert_allclose(
        np.sort(scene.points, axis=0), np.sort(np.rint(pts / 1e-4) * 1e-4, axis=0), atol=1e-4
    )
    # cache hit path
    scene2 = Scene.from_file(f, cache_dir=tmp_path / "cache")
    assert scene2.n_points == 2000


def test_e57_embedded_images(tmp_path):
    """getImage parity: K from pinhole params, axis-flipped inverted pose,
    jpeg blob round trip (reference PointCloudReader.cpp:18-51, 71-93)."""
    _native_e57_or_skip()
    from rtnr_tpu.camera import pose_from_quat_trans
    from rtnr_tpu.data.e57 import E57Reader
    from rtnr_tpu.data.e57_write import E57Image, scan_from_arrays, write_e57

    rng = np.random.default_rng(5)
    rgb = (np.mgrid[0:32, 0:40][0] * 6).astype(np.uint8)
    rgb = np.stack([rgb, rgb[::-1], rgb.T[:32, :40] if False else rgb], -1)
    pose = (0.8, 0.1, 0.5, np.sqrt(1 - 0.8**2 - 0.01 - 0.25), 2.0, -1.0, 4.0)
    img = E57Image(
        jpeg_bytes=_jpeg_bytes(np.ascontiguousarray(rgb)),
        image_width=40, image_height=32,
        focal_length=0.035, pixel_width=0.035 / 800, pixel_height=0.035 / 790,
        principal_point_x=20.5, principal_point_y=16.25, pose=pose,
    )
    f = tmp_path / "img.e57"
    write_e57(f, [scan_from_arrays(rng.uniform(-1, 1, (50, 3)), None)], [img])
    with E57Reader(f) as r:
        assert r.image_count == 1
        dec, w2c, K = r.get_image(0)
    assert dec.shape == (32, 40, 3)
    assert np.abs(dec.astype(int) - rgb.astype(int)).mean() < 8  # jpeg lossy
    np.testing.assert_allclose(np.diag(K), [800.0, 790.0, 1.0])
    np.testing.assert_allclose(K[0, 2], 20.5)
    P = pose_from_quat_trans(*pose) @ np.diag([1.0, -1.0, -1.0, 1.0])
    np.testing.assert_allclose(w2c, np.linalg.inv(P), atol=1e-12)
