"""Benchmark: full-scale differentiable-raster gradient step (5M pts, 1080p).

The north-star differentiability claim at production scale: one jitted
step computing d(loss)/d(points, colors, cam_proj) through the sort-based
custom-VJP raster (ops/raster_diff.rasterize_diff_sorted) at the bench
shape. Prints one JSON line; numbers are recorded in the current round's
PROFILE_r0N.md (history: r2 244.6 ms, r3 94.7 ms).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N_POINTS = int(os.environ.get("BENCH_POINTS", 5_000_000))
WIDTH = int(os.environ.get("BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1080))
REPS = int(os.environ.get("BENCH_REPS", 10))


def main():
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.ops.raster_diff import rasterize_diff_sorted
    from rtnr_tpu.scene import Scene

    print(f"# backend: {jax.devices()[0]}", file=sys.stderr, flush=True)
    scene = Scene.synthetic(N_POINTS, seed=0, extent=10.0)
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    points = jnp.asarray(pts)
    colors = jnp.asarray(cols, jnp.float32)
    validd = jnp.asarray(valid)
    cam = Camera.from_params(1100.0, 1100.0, WIDTH / 2, HEIGHT / 2, WIDTH, HEIGHT)
    E = np.eye(4)
    E[2, 3] = 12.0
    M0 = jnp.asarray(cam.cam_proj(E), jnp.float32)
    # an arbitrary fixed target so the loss has dense pixel cotangents
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (HEIGHT, WIDTH, 3), jnp.float32, 0.0, 255.0)

    def loss(points, colors, M):
        out = rasterize_diff_sorted(
            points, colors, M, width=WIDTH, height=HEIGHT, valid=validd
        )
        diff = (out.rgb - target) * out.mask[..., None]
        return jnp.mean(diff * diff) + jnp.sum(
            jnp.where(out.mask, out.depth, 0.0)
        ) * jnp.float32(1e-9)

    grad = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(points, colors, M0):
        def body(k, carry):
            acc, points, colors = carry
            M = M0.at[0, 3].add(acc * jnp.float32(0.0) + 0.01 * k.astype(jnp.float32))
            gp, gc, gm = grad(points, colors, M)
            return acc + gm[2, 3], points, colors

        acc, _, _ = jax.lax.fori_loop(
            0, REPS, body, (jnp.float32(0.0), points, colors)
        )
        return acc

    print("# compiling...", file=sys.stderr, flush=True)
    np.asarray(run(points, colors, M0))
    t0 = time.perf_counter()
    np.asarray(run(points, colors, M0))
    ms = (time.perf_counter() - t0) / REPS * 1e3

    # sanity: gradients are finite and colors gradient is populated
    gp, gc, gm = jax.block_until_ready(jax.jit(grad)(points, colors, M0))
    finite = bool(
        np.isfinite(np.asarray(gp)).all()
        and np.isfinite(np.asarray(gc)).all()
        and np.isfinite(np.asarray(gm)).all()
    )
    print(
        json.dumps(
            {
                "metric": f"grad_step_ms_{WIDTH}x{HEIGHT}_{N_POINTS // 1_000_000}Mpts",
                "value": round(ms, 2),
                "unit": "ms",
                "grads_finite": finite,
                "nonzero_color_grad_frac": round(
                    float((np.asarray(gc) != 0).mean()), 4
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
