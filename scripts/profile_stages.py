"""Per-stage timing breakdown on the current backend (TPU by default)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from rtnr_tpu.camera import Camera
from rtnr_tpu.models.unet import UNet, init_unet
from rtnr_tpu.ops.prefilter import depth_prefilter
from rtnr_tpu.ops.raster import rasterize
from rtnr_tpu.pipeline import pad_to_pyramid
from rtnr_tpu.scene import Scene


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    width, height = 1920, 1080
    n_points = 5_000_000
    print(f"backend: {jax.devices()[0].platform} {jax.devices()[0]}")

    scene = Scene.synthetic(n_points, seed=0, extent=10.0)
    cam = Camera.from_params(1100.0, 1100.0, width / 2, height / 2, width, height)
    E = np.eye(4)
    E[2, 3] = 12.0
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    points, colors, validd = jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid)
    M = jnp.asarray(cam.cam_proj(E), jnp.float32)

    raster = jax.jit(
        lambda m: rasterize(points, colors, m, width=width, height=height, valid=validd)
    )
    t_raster = timeit(raster, M)
    print(f"raster ({n_points/1e6:.0f}M pts -> {width}x{height}): {t_raster:.1f} ms")

    rgb, depth = raster(M)
    dpad, cpad = pad_to_pyramid(depth, rgb, 4)
    prefilter = jax.jit(lambda d, c: depth_prefilter(d, c, levels=4))
    t_pref = timeit(prefilter, dpad, cpad)
    print(f"prefilter ({dpad.shape}): {t_pref:.1f} ms")

    packed = prefilter(dpad, cpad)["unet_input"][None]
    unet = UNet(features=(64, 128, 256, 512), dtype=jnp.bfloat16)
    _, variables = init_unet(jax.random.PRNGKey(0), 64, 64)
    apply = jax.jit(lambda v, x: unet.apply(v, x))
    t_unet = timeit(apply, variables, packed)
    print(f"unet ({packed.shape} bf16): {t_unet:.1f} ms")

    print(f"sum: {t_raster + t_pref + t_unet:.1f} ms "
          f"-> {1000 / (t_raster + t_pref + t_unet):.2f} fps")


if __name__ == "__main__":
    main()
