"""Trustworthy per-stage budget at bench methodology (whole-pipeline shape).

Earlier microbenchmarks on this backend disagree below ~5 ms granularity
(see profile_floor.py: marginal-cost and isolated measurements of the same
op differ 3x). The only signal that reconciles with the end-to-end bench is
a LONG chained loop of the exact stage, timed once — this script measures
each pipeline stage that way (20+ chained iterations inside one jit, one
block_until_ready), so stage numbers are directly comparable with bench.py
frames/sec.

Usage: python scripts/bench_parts.py [unet|raster|all]
"""

import os
import sys
import time

import numpy as np

REPS = int(os.environ.get("BENCH_REPS", 20))
N_POINTS = int(os.environ.get("BENCH_POINTS", 5_000_000))
WIDTH = int(os.environ.get("BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1080))


def run_loop(make_body, init, reps=REPS):
    """make_body(k, carry)->carry chained reps times in one jit; returns
    seconds per iteration."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(init):
        return jax.lax.fori_loop(0, reps, make_body, init)

    jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    jax.block_until_ready(run(init))
    return (time.perf_counter() - t0) / reps * 1e3


def bench_unet():
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, init_unet
    from rtnr_tpu.pipeline import pyramid_pad_shape

    H, W = pyramid_pad_shape(HEIGHT, WIDTH, 4)
    features = (64, 128, 256, 512)
    int8_mode = os.environ.get("UNET_INT8", "0")  # 0 off | 1 dyn | 2 static
    variant = dict(
        tiny_cin_impl=os.environ.get("UNET_IM2COL", "im2col"),
        pool_impl=os.environ.get("UNET_POOL", "reduce_window"),
        skip_concat=os.environ.get("UNET_SKIP", "concat"),
        up_impl=os.environ.get("UNET_UP", "convt"),
        conv_impl=os.environ.get("UNET_CONV", "xla"),
        quant_int8=int8_mode != "0",
    )
    print(f"unet variant: {variant} int8_mode={int8_mode}", flush=True)
    unet = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True, **variant)
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = jax.device_put(fold_batchnorm(raw))
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 5), jnp.bfloat16)

    scales = None
    if int8_mode == "2":
        from rtnr_tpu.models.unet import calibrate_act_scales

        scales = calibrate_act_scales(unet, variables, x0)

    def body(k, x):
        y = unet.apply(variables, x, act_scales=scales)  # (1, H, W, 3)
        # data dependence: next input carries the previous output
        return jnp.concatenate([y * jnp.bfloat16(1e-3), x[..., 3:]], axis=-1)

    ms = run_loop(body, x0)
    tflops = 3.5e12 / (ms * 1e-3) / 1e12
    print(f"unet x{REPS} chained @ {H}x{W}: {ms:7.2f} ms/apply  (~{tflops:.0f} TF/s)",
          flush=True)
    return ms


def _scene_arrays():
    import jax.numpy as jnp

    from rtnr_tpu.scene import Scene

    scene = Scene.synthetic(N_POINTS, seed=0, extent=10.0)
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    return jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid)


def _cam_matrix():
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera

    cam = Camera.from_params(1100.0, 1100.0, WIDTH / 2, HEIGHT / 2, WIDTH, HEIGHT)
    E = np.eye(4)
    E[2, 3] = 12.0
    return jnp.asarray(cam.cam_proj(E), jnp.float32)


def bench_raster():
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.ops.raster import project_and_sort, rasterize

    points, colors, valid = _scene_arrays()
    M0 = _cam_matrix()

    def body_full(k, acc):
        M = M0.at[0, 3].add(acc * jnp.float32(0.0) + 0.01 * k.astype(jnp.float32))
        rgb, depth = rasterize(points, colors, M, width=WIDTH, height=HEIGHT,
                               valid=valid)
        return acc + depth[0, 0] + rgb[0, 0, 0].astype(jnp.float32)

    ms_full = run_loop(body_full, jnp.float32(0.0))
    print(f"raster(sort+resolve) x{REPS}: {ms_full:7.2f} ms/frame", flush=True)

    def body_sort(k, acc):
        M = M0.at[0, 3].add(acc * jnp.float32(0.0) + 0.01 * k.astype(jnp.float32))
        sp = project_and_sort(points, colors, M, width=WIDTH, height=HEIGHT,
                              valid=valid)
        return acc + sp.z[0] + sp.pix[-1].astype(jnp.float32)

    ms_sort = run_loop(body_sort, jnp.float32(0.0))
    print(f"project_and_sort     x{REPS}: {ms_sort:7.2f} ms/frame "
          f"(resolve+uint8 = {ms_full - ms_sort:.2f})", flush=True)

    # sort WITHOUT carriers (the candidate optimization): how much of the
    # sort cost is the 2.07M carrier elements?
    def body_sort_nc(k, acc):
        M = M0.at[0, 3].add(acc * jnp.float32(0.0) + 0.01 * k.astype(jnp.float32))
        sp = project_and_sort(points, colors, M, width=WIDTH, height=HEIGHT,
                              valid=valid, carriers=False)
        return acc + sp.z[0] + sp.pix[-1].astype(jnp.float32)

    ms_nc = run_loop(body_sort_nc, jnp.float32(0.0))
    print(f"project_and_sort (no carriers) x{REPS}: {ms_nc:7.2f} ms/frame", flush=True)
    return ms_full


def bench_prefilter():
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.ops.prefilter import depth_prefilter
    from rtnr_tpu.pipeline import pyramid_pad_shape

    H, W = pyramid_pad_shape(HEIGHT, WIDTH, 4)
    key = jax.random.PRNGKey(0)
    depth0 = jax.random.uniform(key, (H, W), jnp.float32, 5.0, 30.0)
    rgb0 = jax.random.randint(key, (H, W, 3), 0, 255, jnp.int32).astype(jnp.uint8)

    def body(k, carry):
        acc, d = carry
        out = depth_prefilter(d + acc * jnp.float32(0.0), rgb0, levels=4)
        return acc + out["unet_input"][0, 0, 4], d

    ms = run_loop(body, (jnp.float32(0.0), depth0))
    print(f"prefilter x{REPS} @ {H}x{W}: {ms:7.2f} ms/frame", flush=True)
    return ms


def main():
    import jax

    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend: {jax.devices()[0]}  reps={REPS}", flush=True)
    if which in ("unet", "all"):
        bench_unet()
    if which in ("raster", "all"):
        bench_raster()
    if which in ("prefilter", "all"):
        bench_prefilter()


if __name__ == "__main__":
    main()
