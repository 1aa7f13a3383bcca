"""CLI: render a camera trajectory through a point cloud.

Capability parity with the reference example executable
(reference example/render_trajectory/main.cpp:67-102):
``render_trajectory <cloud> <trajectory> <calibration>`` — loads the cloud
(with an npz cache), parses the calibration (COLMAP cameras.txt or matrix
file) and the trajectory (TUM or COLMAP line order — both, since the
reference's README and code disagree; main.cpp:32 vs README.md:92), and
renders every frame. Instead of cv::imshow it writes PNGs, and instead of a
serial per-frame loop it batches frames across the device mesh.

Stages: --stage=project (the reference example's default, main.cpp:96),
--stage=filtered, --stage=full (the paper's neural pipeline; needs --ckpt).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="render_trajectory",
        description="TPU-native real-time neural rendering of LiDAR point clouds",
    )
    p.add_argument("cloud", help=".ply/.e57 point cloud (or a dir holding a pcd.npz cache)")
    p.add_argument("trajectory", help="trajectory file (TUM or COLMAP images.txt)")
    p.add_argument("calibration", help="COLMAP cameras.txt or matrix-format calibration file")
    p.add_argument("-o", "--output", default="renders", help="output directory for PNGs")
    p.add_argument("--stage", choices=("project", "filtered", "full"), default="project")
    p.add_argument("--ckpt", default=None, help="U-Net checkpoint (.pth/.pth.tar or .msgpack)")
    p.add_argument("--traj-format", choices=("tum", "colmap"), default="tum")
    p.add_argument("--cache-dir", default=None, help="scene cache dir (like ~/.pcl_cache)")
    p.add_argument("--batch", type=int, default=0, help="frames per device batch (0 = serial)")
    p.add_argument("--depth", action="store_true", help="also write 16-bit-style depth PNGs")
    p.add_argument("--downsample", type=float, default=1.0, help="per-block keep fraction")
    p.add_argument("--no-compile-cache", action="store_true",
                   help="disable the persistent XLA compilation cache")
    p.add_argument("--tiles", type=int, default=0,
                   help="shard the image into N row strips over an N-device "
                        "mesh with per-strip block-grid candidate gather "
                        "(projection or full stage)")
    p.add_argument("--cull-budget", default="auto",
                   help="block-grid frustum culling point-slot budget: an "
                        "int, 'auto' (default: sized from the first view, "
                        "grown on overflow), or '0'/'off'. Safe at any "
                        "value: a view exceeding the budget falls back to "
                        "the exact full-cloud render; compaction is cached "
                        "across nearby frames")
    p.add_argument("--levels", type=int, default=4,
                   help="depth-prefilter pyramid levels (reference "
                        "depthRescaleDepth)")
    p.add_argument("--features", type=int, nargs="+", default=[64, 128, 256, 512],
                   help="U-Net feature widths (must match the checkpoint)")
    p.add_argument("--timings", action="store_true",
                   help="per-stage RENDER_TIME (projection/filter/unet) per "
                        "frame — runs stages as separate synchronized "
                        "programs (diagnostics; slower than the fused path)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp

    if not args.no_compile_cache:
        from rtnr_tpu.utils.checkpoint import enable_compilation_cache

        enable_compilation_cache()

    from rtnr_tpu.camera import Camera, Trajectory
    from rtnr_tpu.config import RenderConfig
    from rtnr_tpu.pipeline import Renderer
    from rtnr_tpu.scene import Scene
    from rtnr_tpu.utils.checkpoint import load_unet_variables
    from rtnr_tpu.utils.image import write_png

    camera = Camera.load_calibration(args.calibration)
    trajectory = Trajectory.load(args.trajectory, fmt=args.traj_format)
    print(f"Loaded trajectory: {len(trajectory)} frames at {camera.width}x{camera.height}")

    cloud_path = Path(args.cloud)
    if cloud_path.is_dir():
        scene = Scene.load_cache(cloud_path)
        if scene is None:
            print(f"No pcd.npz cache in {cloud_path}", file=sys.stderr)
            return 1
    else:
        scene = Scene.from_file(cloud_path, cache_dir=args.cache_dir)
    if args.downsample < 1.0:
        scene = scene.downsample(args.downsample)
    print(f"Loaded {scene.n_points} points "
          f"({scene.num_blocks[0]}x{scene.num_blocks[1]}x{scene.num_blocks[2]} blocks)")

    variables = None
    if args.stage == "full":
        if args.ckpt is None:
            print("--stage=full requires --ckpt", file=sys.stderr)
            return 1
        variables = load_unet_variables(args.ckpt)

    config = RenderConfig(stage_timing=args.timings, unet_features=tuple(args.features),
                          pyramid_levels=args.levels)
    cull = args.cull_budget
    if isinstance(cull, str):
        cull = None if cull.lower() in ("0", "off", "none") else (
            "auto" if cull.lower() == "auto" else int(cull))
    renderer = Renderer(scene, config=config, unet_variables=variables,
                        cull_budget=cull or None)

    outdir = Path(args.output)
    outdir.mkdir(parents=True, exist_ok=True)

    def frame_name(i: int) -> str:
        name = trajectory[i].filename
        return name if name.endswith(".png") else name + ".png"

    def write_depth(name: str, d: np.ndarray) -> None:
        occ = (d > 0) & (d < 3e38)
        dn = np.zeros_like(d)
        if occ.any():
            lo, hi = d[occ].min(), d[occ].max()
            dn[occ] = (d[occ] - lo) / max(hi - lo, 1e-9) * 255.0
        write_png(outdir / name.replace(".png", "_depth.png"), dn.astype(np.uint8))

    t_start = time.perf_counter()
    if args.tiles > 1:
        from rtnr_tpu.parallel import make_mesh

        mesh = make_mesh((args.tiles,), ("tiles",),
                         devices=jax.devices()[: args.tiles])
        pts, cols, validm = renderer.points, renderer.colors, renderer.valid
        if args.stage == "project":
            from rtnr_tpu.ops.culling import build_block_index
            from rtnr_tpu.parallel.tiles import rasterize_tile_sharded

            index = build_block_index(scene, pad_to_multiple=1024)
            for i in range(len(trajectory)):
                M = jnp.asarray(camera.cam_proj(trajectory.world_to_cam(i)), jnp.float32)
                rgb, depth, cand = rasterize_tile_sharded(
                    pts, cols, validm, M, mesh, width=camera.width, height=camera.height,
                    block_index=index,
                )
                write_png(outdir / frame_name(i), np.asarray(rgb))
                if args.depth:
                    write_depth(frame_name(i), np.asarray(depth))
                print(f"[{i + 1}/{len(trajectory)}] {frame_name(i)}  "
                      f"strip candidates: {np.asarray(cand).tolist()}")
        elif args.stage == "full":
            # whole-pipeline tile sharding: per-strip raster + halo-exchange
            # prefilter (bit-exact) + overlap-and-discard U-Net strips
            from rtnr_tpu.parallel.tiles import render_full_tile_sharded
            from rtnr_tpu.pipeline import pyramid_pad_shape

            levels = config.pyramid_levels
            hp, wp = pyramid_pad_shape(camera.height, camera.width, levels)
            lv = 1 << levels
            strip_lv = args.tiles * lv
            hp = -(-hp // strip_lv) * strip_lv  # strip-aligned pyramid pad
            strip_h = hp // args.tiles
            pollution = sum(2 ** (l + 1) for l in range(1, levels + 1))
            uh = min(32 - 32 % lv if lv <= 32 else 0, strip_h)
            halo = min(-(-(pollution + uh) // lv) * lv, strip_h)
            uh = max(min(uh, halo - pollution), 0)
            for i in range(len(trajectory)):
                M = jnp.asarray(camera.cam_proj(trajectory.world_to_cam(i)), jnp.float32)
                out = render_full_tile_sharded(
                    pts, cols, validm, M, mesh, renderer.unet, variables,
                    width=camera.width, height=hp, levels=levels, halo=halo,
                    unet_halo=uh,
                )
                rgb = np.asarray(out["rgb_unet"])[: camera.height, : camera.width]
                write_png(outdir / frame_name(i), rgb)
                if args.depth:
                    write_depth(
                        frame_name(i),
                        np.asarray(out["raw_depth"])[: camera.height, : camera.width],
                    )
                print(f"[{i + 1}/{len(trajectory)}] {frame_name(i)} (tiles={args.tiles})")
        else:
            print("--tiles supports --stage project or full", file=sys.stderr)
            return 1
        total = time.perf_counter() - t_start
        print(json.dumps({"frames": len(trajectory), "seconds": round(total, 3),
                          "fps": round(len(trajectory) / max(total, 1e-9), 2),
                          "stage": args.stage, "tiles": args.tiles}))
        return 0
    if args.batch > 0:
        # Batched path: frames data-parallel over the device mesh
        # (replaces the reference's serial per-frame loop, main.cpp:92-100).
        from rtnr_tpu.parallel import make_mesh, render_filtered_sharded, render_full_batch

        n_dev = len(jax.devices())
        mesh = make_mesh((n_dev, 1))
        pts, cols, validm = renderer.points, renderer.colors, renderer.valid
        n_frames = len(trajectory)
        bs = max(args.batch, n_dev)
        bs -= bs % n_dev  # divisible by the batch axis
        for s0 in range(0, n_frames, bs):
            idxs = list(range(s0, min(s0 + bs, n_frames)))
            pad = bs - len(idxs)
            Ms = np.stack(
                [camera.cam_proj(trajectory.world_to_cam(i)) for i in idxs]
                + [camera.cam_proj(trajectory.world_to_cam(idxs[-1]))] * pad
            ).astype(np.float32)
            if args.stage == "full":
                out = render_full_batch(
                    pts, cols, validm, jnp.asarray(Ms), mesh, renderer.unet,
                    renderer.unet_variables, width=camera.width, height=camera.height,
                )
                rgbs = np.asarray(out["rgb_unet"])
            else:
                out = render_filtered_sharded(
                    pts, cols, validm, jnp.asarray(Ms), mesh,
                    width=camera.width, height=camera.height,
                )
                key = "raw_rgb" if args.stage == "project" else "rgb"
                rgbs = np.asarray(out[key])
            depths = np.asarray(out["raw_depth"] if args.stage == "project" else out["depth"])
            for j, i in enumerate(idxs):
                write_png(outdir / frame_name(i), rgbs[j])
                if args.depth:
                    write_depth(frame_name(i), depths[j])
            print(f"[{idxs[-1] + 1}/{n_frames}] batch of {len(idxs)} frames")
    else:
        stage_fn = {
            "project": renderer.compute_rgbd,
            "filtered": renderer.compute_filtered_rgbd,
            "full": renderer.compute_full,
        }[args.stage]
        for i in range(len(trajectory)):
            out = stage_fn(camera, trajectory.world_to_cam(i))
            write_png(outdir / frame_name(i), out["rgb"])
            if args.depth:
                write_depth(frame_name(i), np.asarray(out["depth"]))
            print(f"[{i + 1}/{len(trajectory)}] {frame_name(i)}  {renderer.last_timings}")
    total = time.perf_counter() - t_start
    fps = len(trajectory) / total if total > 0 else 0.0
    print(json.dumps({"frames": len(trajectory), "seconds": round(total, 3),
                      "fps": round(fps, 2), "stage": args.stage}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
