"""Culling payoff measurement (VERDICT r2 item 8): full-pipeline fps with
an interior camera, with and without block-grid frustum culling.

The synthetic room-scale cloud surrounds an interior camera, so most blocks
fall outside the frustum; the cached compaction (pipeline.Renderer
semantics) shrinks the sorted stream from 5M to the cull budget. Prints one
JSON line with both fps and the kept-point count. Methodology matches
bench.py (frames chained in one jit via fori_loop).
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
    frames = int(os.environ.get("BENCH_FRAMES", 20))

    import jax
    import jax.numpy as jnp

    from rtnr_tpu.utils.checkpoint import enable_compilation_cache

    enable_compilation_cache()

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, init_unet
    from rtnr_tpu.ops.culling import build_block_index, compact_points, cull_points
    from rtnr_tpu.pipeline import render_full
    from rtnr_tpu.scene import Scene

    features = (64, 128, 256, 512)
    scene = Scene.synthetic(n_points, seed=0, extent=10.0)
    sorted_scene = scene.sorted_by_block()
    pts, cols, valid = sorted_scene.device_arrays(1024)
    cam = Camera.from_params(1100.0, 1100.0, width / 2, height / 2, width, height)

    # interior camera at the cloud's center looking +z: most blocks are
    # behind or beside the frustum
    E = np.eye(4)

    int8_mode = os.environ.get("BENCH_UNET_INT8", "static")
    unet = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                quant_int8=int8_mode != "off")
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw_variables = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = fold_batchnorm(raw_variables)

    points = jnp.asarray(pts)
    colors = jnp.asarray(cols)
    validd = jnp.asarray(valid)
    M0 = jnp.asarray(cam.cam_proj(E), jnp.float32)

    act_scales = None
    if int8_mode == "static":
        from rtnr_tpu.models.unet import calibrate_act_scales
        from rtnr_tpu.ops.conv_phase import to_phase
        from rtnr_tpu.pipeline import pyramid_pad_shape, render_filtered

        mid = render_filtered(points, colors, validd, M0,
                              width=width, height=height)
        ph, pw = pyramid_pad_shape(height, width, 4)
        xp = to_phase(mid["unet_input"][None].astype(jnp.bfloat16),
                      1 << len(features))
        act_scales = calibrate_act_scales(unet, variables,
                                          x_phase=(xp, ph, pw, 5))

    index = build_block_index(sorted_scene, pad_to_multiple=1024)
    keep = cull_points(index, M0, validd, width=width, height=height)
    n_kept = int(np.asarray(jnp.sum(keep.astype(jnp.int32))))
    budget = int(os.environ.get("CULL_BUDGET", -(-n_kept // 1024) * 1024))
    cpts, ccols, cvalid = compact_points(points, colors, keep, budget)
    cpts, ccols, cvalid = map(jax.block_until_ready, (cpts, ccols, cvalid))

    def run(p, c, v):
        def one_frame(M):
            out = render_full(p, c, v, M, unet, variables, width=width,
                              height=height, act_scales=act_scales)
            return (out["rgb"][0, 0, 0].astype(jnp.float32)
                    + out["raw_depth"][0, 0]
                    + out["rgb_f"][height // 2, width // 2, 1])

        @jax.jit
        def render_trajectory(dx):
            def body(k, acc):
                M = M0.at[0, 3].add(dx * k.astype(jnp.float32))
                return acc + one_frame(M)
            return jax.lax.fori_loop(0, frames, body, jnp.float32(0.0))

        jax.block_until_ready(render_trajectory(jnp.float32(0.01)))
        t0 = time.perf_counter()
        jax.block_until_ready(render_trajectory(jnp.float32(0.02)))
        return frames / (time.perf_counter() - t0)

    print(f"# kept {n_kept}/{n_points} -> budget {budget}", file=sys.stderr, flush=True)
    fps_full = run(points, colors, validd)
    fps_cull = run(cpts, ccols, cvalid)
    print(json.dumps({
        "metric": f"culling_fps_{width}x{height}_{n_points // 1_000_000}Mpts",
        "fps_full_cloud": round(fps_full, 3),
        "fps_culled": round(fps_cull, 3),
        "kept_points": n_kept,
        "cull_budget": budget,
        "speedup": round(fps_cull / fps_full, 3),
    }))


if __name__ == "__main__":
    main()
