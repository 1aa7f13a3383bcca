"""Camera calibration / trajectory parser tests.

Covers both file formats of reference CameraCalibration.cpp:101-208 and both
trajectory orders (reference main.cpp:32 vs README.md:92 discrepancy)."""

import numpy as np
import pytest

from rtnr_tpu.camera import Camera, Trajectory, quat_to_rotmat, pose_from_quat_trans


def test_colmap_cameras_txt(tmp_path):
    f = tmp_path / "cameras.txt"
    f.write_text(
        "# Camera list with one line of data per camera:\n"
        "#   CAMERA_ID, MODEL, WIDTH, HEIGHT, PARAMS[]\n"
        "1 OPENCV 1920 1080 1400.5 1401.5 960.0 540.0 0.01 -0.02 0.001 0.002 0.0005\n"
    )
    cam = Camera.load_calibration(f)
    assert (cam.width, cam.height) == (1920, 1080)
    assert cam.fx == 1400.5 and cam.fy == 1401.5
    assert cam.cx == 960.0 and cam.cy == 540.0
    assert cam.dists == (0.01, -0.02, 0.001, 0.002, 0.0005)
    assert not cam.fisheye


def test_colmap_fisheye(tmp_path):
    f = tmp_path / "cameras.txt"
    f.write_text("1 OPENCV_FISHEYE 640 480 300 300 320 240 0.1 0.2 0.3 0.4\n")
    cam = Camera.load_calibration(f)
    assert cam.fisheye
    assert cam.dists == (0.1, 0.2, 0.3, 0.4)


def test_colmap_unsupported_model(tmp_path):
    f = tmp_path / "cameras.txt"
    f.write_text("1 SIMPLE_PINHOLE 640 480 300 320 240\n")
    with pytest.raises(ValueError, match="Unsupported camera model"):
        Camera.load_calibration(f)


def test_matrix_file_roundtrip(tmp_path):
    cam = Camera.from_params(500.0, 501.0, 320.0, 240.0, 640, 480, (0.1, 0.2, 0.0, 0.0, -0.1))
    f = tmp_path / "calib.txt"
    cam.save_calibration(f)
    cam2 = Camera.load_calibration(f)
    assert (cam2.width, cam2.height) == (640, 480)
    np.testing.assert_allclose(cam2.K, cam.K)
    assert cam2.dists == cam.dists
    assert cam2.fisheye == cam.fisheye


def test_matrix_file_comma_dists(tmp_path):
    f = tmp_path / "calib.txt"
    f.write_text("640 480\n500 0 320\n0 500 240\n0 0 1\n0.1, 0.2, 0.0, 0.0, -0.1\n0\n")
    cam = Camera.load_calibration(f)
    assert cam.dists == (0.1, 0.2, 0.0, 0.0, -0.1)


def test_matrix_file_wrong_dist_count(tmp_path):
    f = tmp_path / "calib.txt"
    f.write_text("640 480\n500 0 320\n0 500 240\n0 0 1\n0.1 0.2\n0\n")
    with pytest.raises(ValueError, match="expects 5 distortion"):
        Camera.load_calibration(f)


def test_scaled_calibration():
    cam = Camera.from_params(500.0, 400.0, 320.0, 240.0, 640, 480)
    s = cam.scaled(1280, 480)
    assert s.fx == 1000.0 and s.cx == 640.0
    assert s.fy == 400.0 and s.cy == 240.0  # height unchanged


def test_quat_identity_and_known_rotation():
    np.testing.assert_allclose(quat_to_rotmat(1, 0, 0, 0), np.eye(3), atol=1e-12)
    # 90 deg about z
    s = np.sqrt(0.5)
    R = quat_to_rotmat(s, 0, 0, s)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    # non-normalized input is normalized internally (main.cpp:35)
    R2 = quat_to_rotmat(2 * s, 0, 0, 2 * s)
    np.testing.assert_allclose(R, R2, atol=1e-12)


def test_trajectory_tum(tmp_path):
    f = tmp_path / "traj.txt"
    s = np.sqrt(0.5)
    f.write_text(
        "# comment line\n"
        "0.0 1.0 2.0 3.0 0 0 0 1\n"
        f"1.0 0.0 0.0 0.0 0 0 {s} {s}\n"
    )
    traj = Trajectory.load(f, fmt="tum")
    assert len(traj) == 2
    np.testing.assert_allclose(traj[0].pose[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(traj[0].pose[:3, :3], np.eye(3), atol=1e-12)
    # entry 1: rotation 90deg about z
    np.testing.assert_allclose(traj[1].pose[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    # world_to_cam is the inverse
    np.testing.assert_allclose(traj.world_to_cam(0) @ traj[0].pose, np.eye(4), atol=1e-12)


def test_trajectory_colmap(tmp_path):
    f = tmp_path / "images.txt"
    f.write_text("1 1 0 0 0 5.0 6.0 7.0 1 frame0.png\n")
    traj = Trajectory.load(f, fmt="colmap")
    # COLMAP stores world->cam; pose is cam->world = inverse
    w2c = traj.world_to_cam(0)
    np.testing.assert_allclose(w2c[:3, 3], [5, 6, 7], atol=1e-12)
    assert traj[0].filename == "frame0.png"


def test_trajectory_colmap_real_format(tmp_path):
    """Genuine COLMAP images.txt: 4 header comments, then per image a pose
    line alternating with a POINTS2D line (floats; may be empty)."""
    f = tmp_path / "images.txt"
    f.write_text(
        "# Image list with two lines of data per image:\n"
        "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME\n"
        "#   POINTS2D[] as (X, Y, POINT3D_ID)\n"
        "# Number of images: 3, mean observations per image: 2\n"
        "1 1 0 0 0 5.0 6.0 7.0 1 frame0.png\n"
        "100.25 200.5 -1 300.0 400.0 12345\n"
        "2 1 0 0 0 1.0 2.0 3.0 1 frame1.png\n"
        "\n"  # empty POINTS2D row
        "3 1 0 0 0 -1.0 -2.0 -3.0 1 frame2.png\n"
        "7.0 8.0 9\n"
    )
    traj = Trajectory.load(f, fmt="colmap")
    assert len(traj) == 3
    assert [e.filename for e in traj.entries] == ["frame0.png", "frame1.png", "frame2.png"]
    assert [e.frame_id for e in traj.entries] == [1, 2, 3]
    np.testing.assert_allclose(traj.world_to_cam(0)[:3, 3], [5, 6, 7], atol=1e-12)
    np.testing.assert_allclose(traj.world_to_cam(2)[:3, 3], [-1, -2, -3], atol=1e-12)


def test_trajectory_colmap_pose_only_file(tmp_path):
    """Minimal exports with only pose lines (no POINTS2D rows) still parse."""
    f = tmp_path / "images.txt"
    f.write_text(
        "1 1 0 0 0 5.0 6.0 7.0 1 frame0.png\n"
        "2 1 0 0 0 1.0 2.0 3.0 1 frame1.png\n"
    )
    traj = Trajectory.load(f, fmt="colmap")
    assert len(traj) == 2
    np.testing.assert_allclose(traj.world_to_cam(1)[:3, 3], [1, 2, 3], atol=1e-12)


def test_binary_calibration_truncated(tmp_path):
    cam = Camera.from_params(100, 100, 32, 24, 64, 48, dists=(0.1, 0.2, 0.3, 0.4, 0.5))
    f = tmp_path / "calib.bin"
    cam.save_binary(f)
    raw = f.read_bytes()
    for cut in (10, 79, len(raw) - 8, len(raw) - 1):
        g = tmp_path / f"cut{cut}.bin"
        g.write_bytes(raw[:cut])
        with pytest.raises(ValueError, match="truncated"):
            Camera.load_binary(g)


def test_cam_proj_shape_and_depth_row():
    cam = Camera.from_params(100, 100, 32, 24, 64, 48)
    E = pose_from_quat_trans(1, 0, 0, 0, 0.5, -0.5, 2.0)
    M = cam.cam_proj(E)
    # row 2 must reproduce camera-space z: K row 2 = [0,0,1]
    p = np.array([1.0, 2.0, 3.0, 1.0])
    cam_space = E @ p
    assert np.isclose((M @ p)[2], cam_space[2])


def test_binary_calibration_roundtrip(tmp_path):
    cam = Camera.from_params(1100.5, 1099.25, 960.0, 540.0, 1920, 1080,
                             dists=(0.1, -0.2, 0.001, 0.002, 0.05))
    f = tmp_path / "calib.bin"
    cam.save_binary(f)
    back = Camera.load_binary(f)
    np.testing.assert_array_equal(back.K, cam.K)
    assert back.dists == cam.dists
    assert (back.width, back.height, back.fisheye) == (1920, 1080, False)
    # byte layout matches the reference's struct writes
    # (CameraCalibration.cpp:262-273): 72B K + 8B count + 5*8B dists + 4+4+1
    assert f.stat().st_size == 72 + 8 + 5 * 8 + 4 + 4 + 1


def test_binary_calibration_fisheye(tmp_path):
    cam = Camera.from_params(500, 500, 320, 240, 640, 480,
                             dists=(0.1, 0.2, 0.3, 0.4), fisheye=True)
    f = tmp_path / "fish.bin"
    cam.save_binary(f)
    back = Camera.load_binary(f)
    assert back.fisheye and back.dists == cam.dists
