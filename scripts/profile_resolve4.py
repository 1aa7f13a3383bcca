"""v4 carrier-free resolve knob sweep on the bench-shape stream
(winners sub_chunk, expansion part/sub sizes), chained-loop methodology."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import time

import numpy as np

import jax
import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.ops.raster import project_and_sort
from rtnr_tpu.ops.raster_pallas4 import raster_images_pallas4

N = int(os.environ.get("BENCH_POINTS", 5_000_000))
W = int(os.environ.get("BENCH_WIDTH", 1920))
H = int(os.environ.get("BENCH_HEIGHT", 1080))
REPS = 20


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)
    pts = np.stack(
        [rng.uniform(-10, 10, N), rng.uniform(-10, 10, N), rng.uniform(2, 20, N)], 1
    ).astype(np.float32)
    cols = rng.integers(0, 256, (N, 3), dtype=np.uint8)
    cam = Camera.from_params(1100.0, 1100.0, W / 2, H / 2, W, H)
    E = np.eye(4)
    E[2, 3] = 12.0
    M = jnp.asarray(cam.cam_proj(E), jnp.float32)
    sp = project_and_sort(
        jnp.asarray(pts), jnp.asarray(cols), M, width=W, height=H, carriers=False
    )
    sp = jax.tree.map(jax.device_put, sp)
    hw = W * H

    def timed(**kw):
        @jax.jit
        def run(z0):
            def body(k, acc):
                spk = sp._replace(z=sp.z + 0.0 * acc + z0)
                s, c, d = raster_images_pallas4(spk, hw, 0.02, **kw)
                return acc + d[0] + s[0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, REPS, body, jnp.float32(0.0))

        # warm and timed runs use DIFFERENT z0: the axon backend memoizes
        # identical (program, input) executions (CLAUDE.md timing notes)
        jax.block_until_ready(run(jnp.float32(0.0)))
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.float32(1e-12)))
        return (time.perf_counter() - t0) / REPS * 1e3

    base = dict(part_size=16384, sub_chunk=2048, expand_part=16384,
                expand_sub=1024)
    print(f"default {base}: {timed(**base):7.2f} ms", flush=True)
    import json
    cases = os.environ.get("RESOLVE_CASES")
    if cases:
        case_list = [dict(zip(("part_size", "sub_chunk", "expand_part",
                               "expand_sub"), c))
                     for c in json.loads(cases)]
    else:
        case_list = [
            dict(part_size=32768, sub_chunk=2048, expand_part=32768,
                 expand_sub=1024),
            dict(part_size=32768, sub_chunk=4096, expand_part=32768,
                 expand_sub=2048),
            dict(part_size=8192, sub_chunk=1024, expand_part=8192,
                 expand_sub=1024),
        ]
    for kw in case_list:
        print(f"{kw}: {timed(**kw):7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
