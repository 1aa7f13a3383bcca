"""CLI: fine-tune the refinement U-Net with the rasterizer in the graph.

The reference ships no training code (SURVEY.md section 2); this is the
training entry point the paper's workflow implies: pairs of (posed
ground-truth image, live raster+prefilter render) drive an L1 loss on the
U-Net output, with frames batched across the device mesh and parameter
gradients mean-reduced over the global batch.

Data: either a directory of PNG targets + a trajectory + calibration
(photos aligned to poses, the loadCubemaps-style workflow,
reference cloudreader.cpp:219-254), or --self-supervised for a smoke run
against the scene's own projections.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="train_unet")
    p.add_argument("cloud", help=".ply/.e57 cloud or cache dir")
    p.add_argument("trajectory")
    p.add_argument("calibration")
    p.add_argument("--targets", default=None, help="directory of target PNGs (frame_<i>.png)")
    p.add_argument("--self-supervised", action="store_true",
                   help="use the scene's own projections as targets (smoke training)")
    p.add_argument("--init-ckpt", default=None, help="initial U-Net weights (.pth/.msgpack/orbax dir)")
    p.add_argument("-o", "--output", default="unet_ckpt.msgpack")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--batch", type=int, default=0, help="frames per step (0 = one per device)")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--features", type=int, nargs="+", default=[64, 128, 256, 512])
    p.add_argument("--log-every", type=int, default=10)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera, Trajectory
    from rtnr_tpu.models.unet import UNet, init_unet
    from rtnr_tpu.parallel.mesh import make_mesh
    from rtnr_tpu.scene import Scene
    from rtnr_tpu.train.trainer import create_train_state, make_train_step
    from rtnr_tpu.utils.checkpoint import load_unet_variables, save_msgpack
    from rtnr_tpu.utils.image import read_png

    camera = Camera.load_calibration(args.calibration)
    trajectory = Trajectory.load(args.trajectory)
    cloud_path = Path(args.cloud)
    scene = (
        Scene.load_cache(cloud_path) if cloud_path.is_dir() else Scene.from_file(cloud_path)
    )
    if scene is None:
        print("No scene found", file=sys.stderr)
        return 1

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev, 1))
    batch = args.batch or n_dev
    batch -= batch % n_dev or 0
    batch = max(batch, n_dev)

    features = tuple(args.features)
    unet = UNet(features=features, dtype=jnp.bfloat16)
    if args.init_ckpt:
        variables = load_unet_variables(args.init_ckpt)
    else:
        _, variables = init_unet(
            jax.random.PRNGKey(0), 64, 64, features=features
        )
    state, tx = create_train_state(unet, variables, learning_rate=args.lr)
    step_fn = make_train_step(
        unet, tx, mesh, width=camera.width, height=camera.height,
        points_axis="points", batch_axis="batch",
    )

    pts, cols, valid = scene.sorted_by_block().device_arrays(8 * n_dev)
    points, colors = jnp.asarray(pts), jnp.asarray(cols)
    validd = jnp.asarray(valid)

    # Assemble (cam_proj, target) pools
    projs, targets = [], []
    for i in range(len(trajectory)):
        projs.append(camera.cam_proj(trajectory.world_to_cam(i)).astype(np.float32))
        if args.targets:
            f = Path(args.targets) / trajectory[i].filename
            if not f.exists():
                f = Path(args.targets) / f"frame_{i + 1}.png"
            targets.append(read_png(f).astype(np.float32) / 255.0)
    if args.self_supervised:
        from rtnr_tpu.pipeline import Renderer

        r = Renderer(scene)
        targets = [
            r.compute_rgbd(camera, trajectory.world_to_cam(i))["rgb"].astype(np.float32) / 255.0
            for i in range(len(trajectory))
        ]
    if not targets:
        print("No targets: pass --targets DIR or --self-supervised", file=sys.stderr)
        return 1

    projs = np.stack(projs)
    targets = np.stack(targets)
    rng = np.random.default_rng(0)

    t0 = time.perf_counter()
    for step in range(args.steps):
        sel = rng.choice(len(projs), size=batch, replace=len(projs) < batch)
        state, metrics = step_fn(
            state, points, colors, validd,
            jnp.asarray(projs[sel]), jnp.asarray(targets[sel]),
        )
        if step % args.log_every == 0 or step == args.steps - 1:
            m = jax.device_get(metrics)
            print(json.dumps({"step": step, "loss": float(m["loss"]),
                              "grad_norm": float(m["grad_norm"]),
                              "sec": round(time.perf_counter() - t0, 1)}))

    save_msgpack(args.output, {"params": state.params, "batch_stats": state.batch_stats})
    print(f"saved {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
