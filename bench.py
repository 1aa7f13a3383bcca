"""Benchmark: full neural render (raster + prefilter + U-Net) at 1920x1080.

Prints ONE JSON line: frames/sec per chip vs the 30 FPS north-star target
(BASELINE.md). Runs on whatever backend the environment provides (real TPU
chip under the driver; CPU fallback works but is slow).

Scene: 5M-point synthetic cloud (the ScanNet++-room-scale config of
BASELINE.json), full-width U-Net [64,128,256,512] in bf16.
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    n_points = int(os.environ.get("BENCH_POINTS", 5_000_000))
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 10))
    baseline_fps = 30.0

    import jax
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.models.unet import UNet, init_unet
    from rtnr_tpu.pipeline import render_full
    from rtnr_tpu.scene import Scene

    features = (64, 128, 256, 512)
    scene = Scene.synthetic(n_points, seed=0, extent=10.0)
    cam = Camera.from_params(
        1100.0, 1100.0, width / 2, height / 2, width, height
    )
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)

    from rtnr_tpu.models.fold_bn import fold_batchnorm

    unet = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True)
    _, raw_variables = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = fold_batchnorm(raw_variables)

    points = jnp.asarray(pts)
    colors = jnp.asarray(cols)
    validd = jnp.asarray(valid)

    @jax.jit
    def frame(cam_proj, unet_variables):
        out = render_full(
            points, colors, validd, cam_proj, unet, unet_variables,
            width=width, height=height,
        )
        return out["rgb"], out["raw_depth"]

    def proj(i):
        E = np.eye(4)
        E[2, 3] = 12.0 + 0.05 * i
        E[0, 3] = 0.02 * i
        return jnp.asarray(cam.cam_proj(E), jnp.float32)

    # Warmup / compile
    jax.block_until_ready(frame(proj(0), variables))
    jax.block_until_ready(frame(proj(1), variables))

    t0 = time.perf_counter()
    for i in range(frames):
        rgb, depth = frame(proj(i + 2), variables)
    jax.block_until_ready((rgb, depth))
    dt = time.perf_counter() - t0
    fps = frames / dt

    print(
        json.dumps(
            {
                "metric": f"fps_{width}x{height}_full_pipeline_{n_points//1_000_000}Mpts",
                "value": round(fps, 3),
                "unit": "frames/s",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
