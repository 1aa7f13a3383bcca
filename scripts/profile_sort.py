"""Sort-cost ablation on TPU (trusted fori_loop-chained pattern).

The raster's dominant non-U-Net cost is one lax.sort over the 7.07M-element
point+carrier stream (3 i32 operands, num_keys=2). Variants:
  stable    : jax.lax.sort(..., is_stable=True) — the default the raster used
  unstable  : is_stable=False — none of the raster's sorts need stability
              (equal (pixel, depth-bits) elements are interchangeable in all
              downstream segment math)
  unstable1 : num_keys=1 on a fused... (skipped: i64 keys were a measured
              dead end) — instead: 2 ops only (drop the color payload) to
              bound the per-operand cost
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 5_000_000 + 1920 * 1080  # points + carriers


def timed(fn, args, reps=5):
    # inputs passed as jit ARGUMENTS (not closure captures) so repeat runs
    # aren't memoized by the remote backend — see CLAUDE.md / profile_micro.py
    @jax.jit
    def run(*args):
        def body(i, carry):
            acc, xs = carry
            xs0 = tuple(x + (acc * jnp.int32(0)).astype(x.dtype) for x in xs)
            outs = fn(*xs0)
            return acc + outs[0][0].astype(jnp.int32), xs

        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.int32(0), args))
        return acc

    np.asarray(run(*args))
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    pix = jax.random.randint(k1, (N,), 0, 1920 * 1080 + 1, jnp.int32)
    zb = jax.random.randint(k2, (N,), 0, 1 << 30, jnp.int32)
    packed = jax.random.randint(k3, (N,), 0, 1 << 25, jnp.int32)

    for name, fn, args in [
        ("stable 3ops nk2", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=True), (pix, zb, packed)),
        ("unstable 3ops nk2", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=False), (pix, zb, packed)),
        ("unstable 2ops nk2", lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False), (pix, zb)),
        ("unstable 3ops nk1", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1, is_stable=False), (pix, zb, packed)),
    ]:
        try:
            t = timed(fn, args)
            print(f"{name:22s} {t:7.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:22s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
