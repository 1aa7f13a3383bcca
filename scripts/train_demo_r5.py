"""End-to-end U-Net training to convergence on the chip (VERDICT r5 item 5).

Runs the REAL CLI workflow (rtnr_tpu.apps.train_unet --self-supervised) on a
generated scene: writes a PLY cloud + TUM trajectory + calibration to a temp
dir, trains O(100+) steps at a real resolution, reloads the saved
checkpoint, and renders one frame with the trained vs untrained net against
the self-supervised target — the loss curve and the reload improvement are
the demonstrated-workflow evidence (reference analog: the pair-generation
workflow the reference implies but never ships, cloudreader.cpp:219-254).

Usage: PYTHONPATH=... python scripts/train_demo_r5.py [steps]
"""

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 150
W, H = 640, 352


def main():
    d = tempfile.mkdtemp(prefix="rtnr_train_")
    rng = np.random.default_rng(7)
    # structured scene: colored walls + floor so the net has signal to fit
    n = 400_000
    walls = []
    cols = []
    for k in range(4):
        m = n // 4
        p = rng.uniform(-4, 4, (m, 3))
        if k == 0:
            p[:, 2] = 6.0 + 0.05 * rng.standard_normal(m)  # back wall
            c = np.stack([200 + 0 * p[:, 0], 60 + 20 * p[:, 0], 60 + 10 * p[:, 1]], 1)
        elif k == 1:
            p[:, 1] = 3.0 + 0.05 * rng.standard_normal(m)  # floor
            c = np.stack([60 + 10 * p[:, 0], 180 + 0 * p[:, 0], 60 + 10 * p[:, 2]], 1)
        elif k == 2:
            p[:, 0] = -4.0 + 0.05 * rng.standard_normal(m)
            p[:, 2] = rng.uniform(0, 6, m)
            c = np.stack([60 + 0 * p[:, 1], 60 + 10 * p[:, 1], 200 + 5 * p[:, 2]], 1)
        else:
            p[:, 0] = 4.0 + 0.05 * rng.standard_normal(m)
            p[:, 2] = rng.uniform(0, 6, m)
            c = np.stack([200 + 0 * p[:, 1], 180 + 5 * p[:, 1], 60 + 0 * p[:, 2]], 1)
        walls.append(p)
        cols.append(np.clip(c + 10 * rng.standard_normal(c.shape), 0, 255))
    pts = np.concatenate(walls).astype(np.float32)
    col = np.concatenate(cols).astype(np.uint8)

    ply = os.path.join(d, "scene.ply")
    with open(ply, "wb") as f:
        hdr = (
            "ply\nformat binary_little_endian 1.0\n"
            f"element vertex {len(pts)}\n"
            "property float x\nproperty float y\nproperty float z\n"
            "property uchar red\nproperty uchar green\nproperty uchar blue\n"
            "end_header\n"
        )
        f.write(hdr.encode())
        rec = np.zeros(len(pts), dtype=[("p", np.float32, 3), ("c", np.uint8, 3)])
        rec["p"] = pts
        rec["c"] = col
        f.write(rec.tobytes())

    traj = os.path.join(d, "traj.txt")
    with open(traj, "w") as f:
        for i in range(16):
            t = i / 15.0
            f.write(f"{i:.1f} {-1.0 + 2.0 * t:.4f} {0.2:.4f} {-2.0 - 1.0 * t:.4f} 0 0 0 1\n")

    calib = os.path.join(d, "calib.txt")
    fx = 420.0
    with open(calib, "w") as f:
        f.write(f"{W} {H}\n{fx} 0 {W/2}\n0 {fx} {H/2}\n0 0 1\n0 0 0 0 0\n0\n")

    ckpt = os.path.join(d, "unet_r5.msgpack")
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/.axon_site:" + os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    t0 = time.perf_counter()
    cmd = [sys.executable, "-m", "rtnr_tpu.apps.train_unet", ply, traj, calib,
           "--self-supervised", "--steps", str(STEPS), "--lr", "2e-4",
           "-o", ckpt, "--log-every", "10"]
    print("running:", " ".join(cmd), flush=True)
    r = subprocess.run(cmd, env=env, capture_output=True, text=True)
    train_s = time.perf_counter() - t0
    print(r.stdout)
    if r.returncode != 0:
        print(r.stderr[-4000:])
        sys.exit(1)
    losses = [json.loads(ln) for ln in r.stdout.splitlines()
              if ln.startswith("{")]
    print(f"# training wall time {train_s:.1f}s "
          f"({STEPS / train_s:.2f} steps/s incl. compile)", flush=True)

    # ---- reload the checkpoint and render: trained vs untrained ----
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera, Trajectory
    from rtnr_tpu.models.unet import UNet, init_unet
    from rtnr_tpu.pipeline import Renderer
    from rtnr_tpu.scene import Scene
    from rtnr_tpu.utils.checkpoint import load_unet_variables
    from rtnr_tpu.config import RenderConfig

    cam = Camera.load_calibration(calib)
    trajectory = Trajectory.load(traj)
    scene = Scene.from_file(ply)
    E = trajectory.world_to_cam(8)  # held-out-ish mid-trajectory pose

    target = None
    outs = {}
    for tag, variables in (
        ("untrained", None),
        ("trained", load_unet_variables(ckpt)),
    ):
        if variables is None:
            with jax.default_device(jax.devices("cpu")[0]):
                _, variables = init_unet(jax.random.PRNGKey(0), 64, 64,
                                         features=(64, 128, 256, 512))
        rdr = Renderer(scene, RenderConfig(unet_int8="off"),
                       unet_variables=variables)
        if target is None:
            target = rdr.compute_rgbd(cam, E)["rgb"].astype(np.float32) / 255.0
        outs[tag] = rdr.compute_full(cam, E)["rgb_f"]
    l1_untrained = float(np.abs(outs["untrained"] - target).mean())
    l1_trained = float(np.abs(outs["trained"] - target).mean())
    print(json.dumps({
        "steps": STEPS, "resolution": f"{W}x{H}",
        "loss_first": losses[0]["loss"], "loss_last": losses[-1]["loss"],
        "train_wall_s": round(train_s, 1),
        "steps_per_s_incl_compile": round(STEPS / train_s, 2),
        "render_l1_untrained": round(l1_untrained, 4),
        "render_l1_trained": round(l1_trained, 4),
        "improvement_x": round(l1_untrained / max(l1_trained, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
