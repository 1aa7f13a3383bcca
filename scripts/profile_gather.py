"""Measure big-gather cost on the TPU backend at raster scale.

Question: what does ``img[pix]`` for n~5M random indices into an hw~2M-row
table actually cost? The sort-based machinery (ops/raster.py docstring)
exists because SCATTER serializes (~100 ns/elem measured r1); gather was
never measured at scale. If a multi-lane gather is O(ms), the diff-raster
backward (ops/raster_diff.bwd_gather_unsort: two full-stream multi-lane
sorts) collapses to one gather + elementwise math.

Chained-loop methodology (CLAUDE.md): N reps inside one jit with a
loop-carried data dependence; marginal cost via differencing rep counts.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("N", 5_000_000))
HW = int(os.environ.get("HW", 1920 * 1080))
REPS = int(os.environ.get("REPS", 20))


def timed(fn, x, reps_list=(10, 20)):
    import jax

    out = {}
    for reps in reps_list:
        r = jax.jit(fn, static_argnums=1)
        y = jax.block_until_ready(r(x, reps))  # compile
        t0 = time.perf_counter()
        y = jax.block_until_ready(r(x, reps))
        out[reps] = (time.perf_counter() - t0) * 1e3
    (r1, t1), (r2, t2) = sorted(out.items())
    marg = (t2 - t1) / (r2 - r1)
    return marg, out


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    pix = jax.random.randint(key, (N,), 0, HW, jnp.int32)
    table1 = jax.random.normal(key, (HW,), jnp.float32)
    table6 = jax.random.normal(key, (HW, 6), jnp.float32)

    def g1(carry, reps):
        def body(_, c):
            idx = (pix + c.astype(jnp.int32)) % HW
            v = jnp.take(table1, idx)
            return c + v[0]

        return jax.lax.fori_loop(0, reps, body, carry)

    def g6(carry, reps):
        def body(_, c):
            idx = (pix + c.astype(jnp.int32)) % HW
            v = jnp.take(table6, idx, axis=0)
            return c + v[0, 0]

        return jax.lax.fori_loop(0, reps, body, carry)

    def g6sep(carry, reps):
        def body(_, c):
            idx = (pix + c.astype(jnp.int32)) % HW
            acc = c
            for i in range(6):
                acc = acc + jnp.take(table6[:, i], idx)[0]
            return acc

        return jax.lax.fori_loop(0, reps, body, carry)

    # one-hot matmul alternative at small-chunk scale for context
    for name, fn in [("take_1lane", g1), ("take_6lane_rows", g6),
                     ("take_6x1lane", g6sep)]:
        marg, raw = timed(fn, jnp.float32(0.0))
        print(f"{name}: marginal {marg:8.3f} ms  raw={raw}", flush=True)


if __name__ == "__main__":
    main()
