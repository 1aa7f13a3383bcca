"""Training-pair generation from E57 embedded imagery (loadCubemaps path).

End-to-end: a synthetic scene is written to .e57 with an embedded "photo"
(actually the scene's own projection), then generate_pairs_from_e57 must
decode the container, recover the pose/intrinsics through the reference's
getImage conventions, and render a depth/projection aligned with the photo
(reference cloudreader.cpp:219-254 + PointCloudReader.cpp:18-51)."""

import io

import numpy as np
import pytest

from rtnr_tpu.camera import Camera
from rtnr_tpu.scene import Scene


def _native_or_skip():
    from rtnr_tpu.data import native

    if not native.available():
        native.build()
    if not native.available() or not hasattr(native._load(), "e57_open"):
        pytest.skip("native ingest library unavailable")


def _jpeg(rgb):
    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(rgb, "RGB").save(b, "JPEG", quality=98)
    return b.getvalue()


def _pose_tuple_for_extrinsics(E):
    """E57 image pose (qw qx qy qz tx ty tz) such that getImage returns
    world_to_cam == E (inverts the axis-flip convention)."""
    from rtnr_tpu.apps.generate_pairs import rotmat_to_quat

    D = np.diag([1.0, -1.0, -1.0, 1.0])
    P = np.linalg.inv(E) @ D
    q = rotmat_to_quat(P[:3, :3])
    return (*q, P[0, 3], P[1, 3], P[2, 3])


@pytest.fixture(scope="module")
def e57_with_images(tmp_path_factory):
    _native_or_skip()
    from rtnr_tpu.data.e57_write import E57Image, scan_from_arrays, write_e57
    from rtnr_tpu.pipeline import Renderer

    scene = Scene.synthetic(20_000, seed=7, extent=4.0)
    W, H = 128, 96
    cam = Camera.from_params(120.0, 120.0, W / 2, H / 2, W, H)
    E = np.eye(4)
    E[2, 3] = 6.0

    r = Renderer(scene)
    ref = r.compute_rgbd(cam, E)

    img = E57Image(
        jpeg_bytes=_jpeg(ref["rgb"]),
        image_width=W, image_height=H,
        focal_length=0.05, pixel_width=0.05 / 120.0, pixel_height=0.05 / 120.0,
        principal_point_x=W / 2, principal_point_y=H / 2,
        pose=_pose_tuple_for_extrinsics(E),
    )
    d = tmp_path_factory.mktemp("e57pairs")
    path = d / "scan.e57"
    # float-single coords: f32 -> f64 -> f32 round-trips exactly, so the
    # reloaded scene renders bit-identical depth
    write_e57(
        path,
        [scan_from_arrays(scene.points.astype(np.float64), scene.colors, cartesian_scale=0.0)],
        [img],
    )
    return path, scene, cam, E, ref


def test_generate_pairs_from_e57_alignment(e57_with_images):
    path, scene, cam, E, ref = e57_with_images
    from rtnr_tpu.data.pairs import generate_pairs_from_e57

    pairs = generate_pairs_from_e57(path, cache_dir=path.parent / "cache")
    assert len(pairs) == 1
    p = pairs[0]
    assert p.camera.width == cam.width and p.camera.height == cam.height
    np.testing.assert_allclose(np.diag(p.camera.K), np.diag(cam.K), rtol=1e-9)
    np.testing.assert_allclose(p.world_to_cam, E, atol=1e-9)
    # depth rendered from the recovered pose is bit-identical to the direct
    # render (float coords round-trip exactly through the container)
    np.testing.assert_array_equal(p.depth, ref["depth"])
    assert (ref["depth"] < 3e38).mean() > 0.05
    # the "photo" is a jpeg of the projection — lossy on salt-and-pepper
    # splats, so compare 8x8 block means (energy must land in the same place)
    def blocks(x):
        return x.astype(float).reshape(12, 8, 16, 8, 3).mean(axis=(1, 3))

    assert np.abs(blocks(p.image) - blocks(ref["rgb"])).mean() < 10.0


def test_generate_pairs_cli(e57_with_images, tmp_path):
    path, scene, cam, E, ref = e57_with_images
    from rtnr_tpu.apps.generate_pairs import main
    from rtnr_tpu.camera import Camera as Cam, Trajectory
    from rtnr_tpu.utils.image import read_png

    out = tmp_path / "pairs"
    rc = main([str(path), "-o", str(out), "--cache-dir", str(tmp_path / "c2")])
    assert rc == 0
    assert (out / "frame_1.png").exists() and (out / "depth_1.npz").exists()
    # the emitted trajectory + calibration reconstruct the same extrinsics
    traj = Trajectory.load(out / "traj.txt", fmt="tum")
    np.testing.assert_allclose(traj.world_to_cam(0), E, atol=1e-9)
    cam2 = Cam.load_calibration(out / "calib.txt")
    np.testing.assert_allclose(cam2.K, cam.K, rtol=1e-9)
    png = read_png(out / "frame_1.png")
    assert png.shape == (cam.height, cam.width, 3)
    dz = np.load(out / "depth_1.npz")
    occ = dz["depth"] < 3e38
    assert occ.mean() > 0.05
