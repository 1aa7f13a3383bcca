"""Raster component ablation on TPU with the trusted fori_loop pattern.

Measures (per frame): full rasterize, project+sort only, and the Pallas
resolve kernel only (pre-sorted input), at several (part, sub_chunk) sizes.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import project_and_sort, rasterize
from rtnr_tpu.ops.raster_pallas import raster_images_pallas
from rtnr_tpu.scene import Scene


def timed(fn, reps=10):
    """fn(acc_f32) -> f32 scalar; chained in fori_loop."""

    @jax.jit
    def run():
        def body(i, acc):
            return fn(acc)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    np.asarray(run())
    t0 = time.perf_counter()
    np.asarray(run())
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    n_points = 5_000_000
    width, height = 1920, 1080
    hw = width * height
    print(f"backend: {jax.devices()[0]}", flush=True)

    scene = Scene.synthetic(n_points, seed=0, extent=10.0)
    cam = Camera.from_params(1100.0, 1100.0, width / 2, height / 2, width, height)
    E = np.eye(4)
    E[2, 3] = 12.0
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    points, colors, validd = jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid)
    M0 = jnp.asarray(cam.cam_proj(E), jnp.float32)

    def full(acc):
        M = M0.at[0, 3].add(acc * jnp.float32(1e-30))
        rgb, depth = rasterize(points, colors, M, width=width, height=height, valid=validd)
        return acc + depth[0, 0] + rgb[0, 0, 0].astype(jnp.float32)

    def sort_only(acc):
        M = M0.at[0, 3].add(acc * jnp.float32(1e-30))
        sp = project_and_sort(points, colors, M, width=width, height=height, valid=validd)
        return acc + sp.z[0] + sp.rgb[0, 0].astype(jnp.float32)

    print(f"full rasterize: {timed(full):.1f} ms", flush=True)
    print(f"project+sort:   {timed(sort_only):.1f} ms", flush=True)

    # kernel-only: pre-sort once, perturb colors (doesn't change sort order)
    sp0 = jax.jit(
        lambda m: project_and_sort(points, colors, m, width=width, height=height, valid=validd)
    )(M0)
    sp0 = jax.tree.map(jnp.asarray, sp0)

    for L, S in [(16384, 2048), (16384, 1024), (16384, 512), (32768, 1024), (8192, 1024), (32768, 2048)]:
        def kern(acc, L=L, S=S):
            rgb2 = sp0.rgb.at[0, 0].add((acc * jnp.float32(1e-30)).astype(jnp.int32))
            sp = sp0._replace(rgb=rgb2)
            sums, cnt, depth = raster_images_pallas(sp, hw, 0.02, part_size=L, sub_chunk=S)
            return acc + depth[0] + sums[0, 0].astype(jnp.float32)

        try:
            ms = timed(kern)
            print(f"pallas resolve L={L} S={S}: {ms:.1f} ms", flush=True)
        except Exception as e:  # VMEM limits etc.
            print(f"pallas resolve L={L} S={S}: FAILED {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
