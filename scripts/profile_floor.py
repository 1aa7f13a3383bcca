"""Quantify the per-iteration overhead floor of the fori_loop timing harness.

Observation (round 2): every isolated op measured by the trusted
fori_loop-chained pattern lands at ~2.7-3.3 ms — including a trivial 1x1
conv whose arithmetic is < 0.1 ms. Either the backend imposes a fixed
per-iteration cost, or the op times are real. Disambiguate by chaining K
data-dependent applications of the SAME op inside each loop body: the slope
of time vs K is the marginal (true) op cost; the intercept is harness/
backend overhead.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_chain(fn, x0, extra, k, reps=6):
    """Each rep applies fn k times, each application data-dependent on the
    previous. Returns per-rep ms."""

    @jax.jit
    def run(x0, extra):
        def body(i, carry):
            acc, x = carry
            y = x
            for _ in range(k):
                y = fn(y + (acc * jnp.float32(0.0)).astype(y.dtype), extra)
            return acc + y.ravel()[0].astype(jnp.float32), x

        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), x0))
        return acc

    np.asarray(run(x0, extra))
    t0 = time.perf_counter()
    np.asarray(run(x0, extra))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    # trivial elementwise op, full-res tensor
    x = jax.random.normal(key, (1, 1088, 1920, 64), jnp.bfloat16)
    triv = lambda x, _: x * jnp.bfloat16(1.0001)
    for k in (1, 4, 16):
        print(f"trivial mul  k={k:2d}: {timed_chain(triv, x, None, k):7.2f} ms/rep", flush=True)

    # 3x3 64->64 conv at full res (the layer class to optimize)
    kern = jax.random.normal(key, (3, 3, 64, 64), jnp.bfloat16) * 0.05
    conv = lambda x, k: jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    for k in (1, 2, 4, 8):
        ms = timed_chain(conv, x, kern, k)
        print(f"conv64 full  k={k:2d}: {ms:7.2f} ms/rep  ({ms / k:5.2f} ms/op)", flush=True)

    # 3x3 512->512 at 136x240 (deep layer class)
    x2 = jax.random.normal(key, (1, 136, 240, 512), jnp.bfloat16)
    k2 = jax.random.normal(key, (3, 3, 512, 512), jnp.bfloat16) * 0.02
    for k in (1, 4, 8):
        ms = timed_chain(conv, x2, k2, k)
        print(f"conv512 deep k={k:2d}: {ms:7.2f} ms/rep  ({ms / k:5.2f} ms/op)", flush=True)

    # cumsum over 5M i32 (raster scan primitive)
    xi = jax.random.randint(key, (5_000_000,), 0, 1000, jnp.int32)

    def cs(x, _):
        return jnp.cumsum(x)

    def timed_chain_int(fn, x0, k, reps=6):
        @jax.jit
        def run(x0):
            def body(i, carry):
                acc, x = carry
                y = x
                for _ in range(k):
                    y = fn(y + (acc * jnp.int32(0)), None)
                return acc + y[0], x

            acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.int32(0), x0))
            return acc

        np.asarray(run(x0))
        t0 = time.perf_counter()
        np.asarray(run(x0))
        return (time.perf_counter() - t0) / reps * 1e3

    for k in (1, 4):
        ms = timed_chain_int(cs, xi, k)
        print(f"cumsum 5M    k={k:2d}: {ms:7.2f} ms/rep  ({ms / k:5.2f} ms/op)", flush=True)

    # the real 2-key sort (5M + carriers), marginal cost
    hw = 1920 * 1080
    pix = jax.random.randint(key, (5_000_000 + hw,), 0, hw + 1, jnp.int32)
    zbv = jax.random.randint(key, (5_000_000 + hw,), 0, 1 << 30, jnp.int32)

    def srt(p, zb):
        a, b = jax.lax.sort((p, zb), num_keys=2, is_stable=False)
        return a + b

    def timed_sort(k, reps=4):
        @jax.jit
        def run(p, zb):
            def body(i, carry):
                acc, p, zb = carry
                y = p
                z = zb
                for _ in range(k):
                    out = srt(y + acc * jnp.int32(0), z)
                    y, z = out, z
                return acc + y[0], p, zb

            acc, _, _ = jax.lax.fori_loop(0, reps, body, (jnp.int32(0), p, zb))
            return acc

        np.asarray(run(pix, zbv))
        t0 = time.perf_counter()
        np.asarray(run(pix, zbv))
        return (time.perf_counter() - t0) / reps * 1e3

    for k in (1, 2):
        ms = timed_sort(k)
        print(f"sort2key 7M  k={k:2d}: {ms:7.2f} ms/rep  ({ms / k:5.2f} ms/op)", flush=True)


if __name__ == "__main__":
    main()
