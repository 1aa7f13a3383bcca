"""Marginal per-layer U-Net costs (chained-k differencing).

Isolated one-op loops on this backend carry a fixed per-iteration overhead
that distorts ops under ~5 ms (profile_floor.py). The defensible per-op
number is the MARGINAL cost: time a loop body with k=2 and k=6 chained
applications of the layer (data-dependent) and report (t6 - t2) / 4.

Covers the layer classes that dominate the U-Net budget at the bench shape.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def chained_ms(fn, x0, k, reps=5):
    @jax.jit
    def run(x0):
        def body(i, carry):
            acc, x = carry
            y = x + (acc * jnp.float32(0.0)).astype(x.dtype)
            for _ in range(k):
                y = fn(y)
            return acc + y.ravel()[0].astype(jnp.float32), x

        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), x0))
        return acc

    np.asarray(run(x0))
    t0 = time.perf_counter()
    np.asarray(run(x0))
    return (time.perf_counter() - t0) / reps * 1e3


def marginal(fn, x0):
    t2 = chained_ms(fn, x0, 2)
    t6 = chained_ms(fn, x0, 6)
    return (t6 - t2) / 4.0


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    def conv_same_shape(ci, co, ksz):
        """Layer classes must be chainable: co != ci handled by projecting
        back with a second fixed kernel so the chain type-checks; the
        reported marginal then covers BOTH convs — note /2 where used."""
        k1 = jax.random.normal(key, (ksz, ksz, ci, co), dt) * 0.02
        k2 = jax.random.normal(key, (ksz, ksz, co, ci), dt) * 0.02

        def f(x):
            y = jax.lax.conv_general_dilated(
                x, k1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                y, k2, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        return f

    def convt_pair(h, w, ci, co):
        """convT 2x2 s2 (ci->co) then a 2x2 s2 maxpool-free downprojection
        back: use a stride-2 2x2 conv co->ci to restore shape."""
        kt = jax.random.normal(key, (2, 2, ci, co), dt) * 0.02
        kd = jax.random.normal(key, (2, 2, co, ci), dt) * 0.02

        def f(x):
            y = jax.lax.conv_transpose(
                x, kt, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.lax.conv_general_dilated(
                y, kd, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        return f

    def matmul_d2s_pair(h, w, ci, co):
        kt = jax.random.normal(key, (2, 2, ci, co), dt) * 0.02
        kd = jax.random.normal(key, (2, 2, co, ci), dt) * 0.02

        def f(x):
            n = x.shape[0]
            k1 = kt.transpose(2, 0, 1, 3).reshape(ci, 4 * co)
            y = (x.reshape(-1, ci) @ k1).reshape(n, h, w, 2, 2, co)
            y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 2, w * 2, co)
            return jax.lax.conv_general_dilated(
                y, kd, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))

        return f

    cases = [
        # (name, fn, input shape, flops of the pair)
        ("conv64<->64 @1088x1920 x2", conv_same_shape(64, 64, 3),
         (1, 1088, 1920, 64), 2 * 2 * 1088 * 1920 * 64 * 64 * 9),
        ("conv128<->128 @544x960 x2", conv_same_shape(128, 128, 3),
         (1, 544, 960, 128), 2 * 2 * 544 * 960 * 128 * 128 * 9),
        ("conv512<->512 @136x240 x2", conv_same_shape(512, 512, 3),
         (1, 136, 240, 512), 2 * 2 * 136 * 240 * 512 * 512 * 9),
        ("conv1024<->1024 @68x120 x2", conv_same_shape(1024, 1024, 3),
         (1, 68, 120, 1024), 2 * 2 * 68 * 120 * 1024 * 1024 * 9),
        ("updc3a-ish 128<->64 @1088x1920 x2", conv_same_shape(128, 64, 3),
         (1, 1088, 1920, 128), 2 * 2 * 1088 * 1920 * 128 * 64 * 9),
        ("convT+down 128->64 @544x960", convt_pair(544, 960, 128, 64),
         (1, 544, 960, 128), 2 * 2 * 544 * 960 * 128 * 64 * 4),
        ("mm+d2s+down 128->64 @544x960", matmul_d2s_pair(544, 960, 128, 64),
         (1, 544, 960, 128), 2 * 2 * 544 * 960 * 128 * 64 * 4),
        ("convT+down 1024->512 @68x120", convt_pair(68, 120, 1024, 512),
         (1, 68, 120, 1024), 2 * 2 * 68 * 120 * 1024 * 512 * 4),
        ("mm+d2s+down 1024->512 @68x120", matmul_d2s_pair(68, 120, 1024, 512),
         (1, 68, 120, 1024), 2 * 2 * 68 * 120 * 1024 * 512 * 4),
    ]
    for name, fn, shape, fl in cases:
        x0 = jax.random.normal(key, shape, dt) * 0.05
        try:
            m = marginal(fn, x0)
        except Exception as e:  # noqa: BLE001
            print(f"{name:36s} FAILED {type(e).__name__}: {e}", flush=True)
            continue
        eff = fl / (m * 1e-3) / 197e12 * 100 if m > 0 else float("nan")
        print(f"{name:36s} {m:7.2f} ms/pair  {fl/1e9:6.1f} GF  {eff:5.1f}% MXU",
              flush=True)


if __name__ == "__main__":
    main()
