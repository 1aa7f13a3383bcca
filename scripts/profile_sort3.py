"""Round-3 sort ablation: global vs batched-row sorts (chained-loop pattern).

Decides the binned-raster design (VERDICT r2 item 1): if XLA's batched row
sort of (B, cap) scales ~log^2(cap), binning the 5M-point stream into B
equal-count pixel-range buckets + one batched sort beats the global sort by
the log factor.

Methodology caveat (learned the hard way): a loop body whose inputs don't
*change* per iteration (`x + acc*0`) is loop-invariant — XLA hoists the sort
out of the fori_loop and the "per-iteration" number is pure loop overhead
(an earlier run of this script reported 6.75 ms for a sort that the
in-context HLO profile shows costs 15.3 ms). Every body below derives its
inputs from the iteration counter AND the running accumulator so nothing
can be hoisted; the same perturbation is applied in the floor reference so
its cost subtracts out.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 5_000_192  # 5M points padded to 1024 (bench shape, carrier-free)


def timed(fn, args, reps=8):
    @jax.jit
    def run(*args):
        def body(k, carry):
            acc, xs = carry
            # real data dependence: values change with k and acc
            xs0 = tuple((x + k + acc) % jnp.int32(1 << 30) for x in xs)
            outs = fn(*xs0)
            o0 = outs[0]
            return acc + o0.reshape(-1)[0].astype(jnp.int32), xs

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
    hw = 1920 * 1080

    def make(shape):
        pix = jax.random.randint(k1, shape, 0, hw + 1, jnp.int32)
        zb = jax.random.randint(k2, shape, 0, 1 << 30, jnp.int32)
        packed = jax.random.randint(k3, shape, 0, 1 << 25, jnp.int32)
        return pix, zb, packed

    g = make((N,))

    cases = [
        ("floor (elementwise)", lambda a, b, c: (a + b + c,), g),
        ("global stable nk2", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=True), g),
        ("global unstable nk2", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=False), g),
        ("global unstable nk1", lambda a, b, c: jax.lax.sort((a, b, c), num_keys=1, is_stable=False), g),
        ("global unstable nk2 2op", lambda a, b: jax.lax.sort((a, b), num_keys=2, is_stable=False), g[:2]),
    ]
    for B in (256, 1024, 2048, 4096):
        cap = ((int(N * 1.1) // B) // 512 + 1) * 512
        r = make((B, cap))
        cases.append(
            (
                f"rows {B}x{cap} unstable nk2",
                lambda a, b, c: jax.lax.sort((a, b, c), num_keys=2, is_stable=False),
                r,
            )
        )

    for name, fn, args in cases:
        try:
            t = timed(fn, args)
            print(f"{name:28s} {t:8.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:28s} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
