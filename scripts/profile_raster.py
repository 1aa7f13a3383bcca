"""Micro-profile of raster internals on TPU: sort widths, gathers, scatters."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5, warmup=2):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    n = 5_000_000
    hw = 1920 * 1080
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.integers(0, hw, n, dtype=np.int32))
    z = jnp.asarray(rng.uniform(1, 30, n).astype(np.float32))
    zb = jax.lax.bitcast_convert_type(z, jnp.int32)
    c0 = jnp.asarray(rng.integers(0, 256, n, dtype=np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)

    print(f"backend: {jax.devices()[0]}  N={n/1e6}M  HW={hw/1e6:.2f}M")

    t = timeit(jax.jit(lambda a: jax.lax.sort((a,), num_keys=1)), pix)
    print(f"sort 1 key 0 payload: {t:.1f} ms")
    t = timeit(jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1)), pix, zb)
    print(f"sort 1 key 1 payload: {t:.1f} ms")
    t = timeit(jax.jit(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2)), pix, zb, c0)
    print(f"sort 2 keys 1 payload: {t:.1f} ms")
    t = timeit(
        jax.jit(lambda a, b, c, d, e: jax.lax.sort((a, b, c, d, e), num_keys=2)),
        pix, zb, c0, c0, c0,
    )
    print(f"sort 2 keys 3 payload: {t:.1f} ms")

    t = timeit(jax.jit(lambda s, i: jnp.take(s, i)), z, pix)
    print(f"gather N from N (random): {t:.1f} ms")
    srt = jnp.sort(pix)
    t = timeit(jax.jit(lambda s, i: jnp.take(s, jnp.minimum(i, hw - 1))), jnp.zeros(hw), srt)
    print(f"gather N from HW (sorted idx): {t:.1f} ms")

    t = timeit(jax.jit(lambda x: jnp.cumsum(x)), c0)
    print(f"cumsum N int32: {t:.1f} ms")
    x4 = jnp.stack([c0, c0, c0, c0], 1)
    t = timeit(jax.jit(lambda x: jnp.cumsum(x, axis=0)), x4)
    print(f"cumsum (N,4) int32: {t:.1f} ms")
    t = timeit(jax.jit(lambda x: jax.lax.cummax(x)), pix)
    print(f"cummax N int32: {t:.1f} ms")

    t = timeit(
        jax.jit(lambda i, v: jnp.zeros((hw,), jnp.float32).at[i].set(v, mode="drop", unique_indices=True)),
        srt, z,
    )
    print(f"unique-scatter N->HW set: {t:.1f} ms")
    t = timeit(
        jax.jit(lambda i, v: jnp.zeros((hw,), jnp.float32).at[i].min(v, mode="drop")),
        pix, z,
    )
    print(f"conflict scatter-min N->HW: {t:.1f} ms")

    t = timeit(jax.jit(lambda i, v: jax.ops.segment_min(v, i, num_segments=hw, indices_are_sorted=True)), srt, z)
    print(f"segment_min sorted N->HW: {t:.1f} ms")


if __name__ == "__main__":
    main()
