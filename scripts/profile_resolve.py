"""Resolve-kernel cost decomposition + (part, sub-chunk) tuning on TPU.

Measures raster_images_pallas3 on a bench-shaped sorted stream with
timing-ablation knobs (skip_scans / skip_placement — results intentionally
wrong, cost structure right) and a sweep of (part_size, sub_chunk).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.ops.raster import project_and_sort
    from rtnr_tpu.ops.raster_pallas3 import raster_images_pallas3
    from rtnr_tpu.scene import Scene

    print(f"backend: {jax.devices()[0]}", flush=True)
    W, H = 1920, 1080
    scene = Scene.synthetic(5_000_000, seed=0, extent=10.0)
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    cam = Camera.from_params(1100.0, 1100.0, W / 2, H / 2, W, H)
    E = np.eye(4)
    E[2, 3] = 12.0
    M = jnp.asarray(cam.cam_proj(E), jnp.float32)
    sp = jax.jit(
        lambda p, c, v: project_and_sort(p, c, M, width=W, height=H, valid=v)
    )(jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid))
    sp = jax.block_until_ready(sp)

    def timed(reps=20, **kw):
        @jax.jit
        def run(sp):
            def body(k, carry):
                acc, sp = carry
                pix = sp.pix + acc * jnp.int32(0)
                sums, cnt, depth = raster_images_pallas3(
                    sp._replace(pix=pix), W * H, 0.02, **kw
                )
                return acc + cnt[0] + sums[0, 0], sp

            acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.int32(0), sp))
            return acc

        np.asarray(run(sp))
        t0 = time.perf_counter()
        np.asarray(run(sp))
        return (time.perf_counter() - t0) / reps * 1e3

    # NOTE: skip_scans poisons the winner/offset carries -> unsafe DMA
    # offsets (TPU internal error); only skip_placement is a safe ablation.
    print(f"v3 onehot S=1024    : {timed(factored=False):7.2f} ms", flush=True)
    print(f"v3 skip placement   : {timed(skip_placement=True):7.2f} ms", flush=True)
    for S in (256, 512, 1024, 2048):
        print(f"v3 factored S={S:5d}: {timed(sub_chunk=S):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
