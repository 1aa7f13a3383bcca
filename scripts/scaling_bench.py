"""Scaling harness: pixels/s across mesh sizes (BASELINE's >85% target).

Runs the batched full pipeline over growing device counts and reports
throughput + efficiency vs the single-device baseline. On a pod slice this
measures real ICI scaling; on a dev box, set
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a
functional (not performance-meaningful) check.
"""

import argparse
import json
import os
import sys
import time

import numpy as np

if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
    # the container's sitecustomize pins jax_platforms to the axon TPU; an
    # env var alone doesn't override it (see CLAUDE.md)
    import jax

    jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--frames-per-device", type=int, default=2)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.parallel.mesh import make_mesh
    from rtnr_tpu.parallel.render import render_filtered_sharded
    from rtnr_tpu.scene import Scene

    n_dev = len(jax.devices())
    scene = Scene.synthetic(args.points, seed=0, extent=10.0)
    cam = Camera.from_params(
        args.width * 0.6, args.width * 0.6, args.width / 2, args.height / 2,
        args.width, args.height,
    )

    results = []
    sizes = [s for s in (1, 2, 4, 8, 16, 32) if s <= n_dev]
    base_rate = None
    for nd in sizes:
        mesh = make_mesh((nd, 1), devices=jax.devices()[:nd])
        pts, cols, valid = scene.sorted_by_block().device_arrays(8 * nd)
        f = args.frames_per_device * nd
        Ms = []
        for i in range(f):
            E = np.eye(4)
            E[2, 3] = 12.0 + 0.05 * i
            Ms.append(cam.cam_proj(E))
        cam_projs = jnp.asarray(np.stack(Ms), jnp.float32)

        def run():
            return render_filtered_sharded(
                jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid),
                cam_projs, mesh, width=args.width, height=args.height,
            )

        jax.block_until_ready(run())  # compile
        t0 = time.perf_counter()
        for _ in range(args.reps):
            out = run()
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.reps
        pixels = f * args.width * args.height
        rate = pixels / dt
        if base_rate is None:
            base_rate = rate / nd  # per-device baseline at nd=1
        eff = rate / (base_rate * nd)
        results.append({"devices": nd, "frames": f, "pixels_per_s": round(rate),
                        "efficiency": round(eff, 3)})
        print(json.dumps(results[-1]))


if __name__ == "__main__":
    main()
