"""int8 vs bf16 MXU throughput in a Pallas kernel at conv_phase shapes.

v5e datasheet: int8 MXU peak is 2x bf16 (394 vs 197 TOP/s). This measures
whether Mosaic actually delivers that for the matmul shapes the phase
U-Net kernels issue (ops/conv_phase.py row loop):

  full-res conv1 :  (192,  192) @ ( 192, 2048)   (3F x 3C) @ (3C x P*WS)
  full-res updc0 :  (192,  384) @ ( 384, 2048)
  deep conv      :  (192, 1536) @ (1536,  256)
  bottleneck     :  (384, 3072) @ (3072,  128)

Methodology: chained fori_loop INSIDE one jit around a pallas_call whose
kernel performs R row-matmuls on VMEM-resident operands (loop-carried
data dependence at the jit level; see CLAUDE.md timing notes).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
ROWS = 2048  # matmuls per kernel invocation (amortizes the ~2.5 ms floor)


def make_mm(m, k, n, dtype, acc):
    def kernel(a_ref, b_ref, o_ref):
        def body(i, out):
            return out + jax.lax.dot_general(
                a_ref[:], b_ref[:],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=acc,
            )

        o_ref[:] = jax.lax.fori_loop(0, ROWS, body, jnp.zeros((m, n), acc))

    @jax.jit
    def run(a, b):
        def body(i, c):
            aa = a + c.astype(dtype)  # loop-carried dependence
            o = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((m, n), acc),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(aa, b)
            return (o[0, 0] * 0).astype(jnp.int32 if acc == jnp.int32 else acc)

        return jax.lax.fori_loop(0, REPS, body, jnp.zeros((), jnp.int32 if acc == jnp.int32 else acc))

    return run


def bench(m, k, n):
    rng = np.random.default_rng(0)
    flops = 2 * m * k * n * ROWS
    out = {}
    for name, dt, acc in (
        ("bf16", jnp.bfloat16, jnp.float32),
        ("int8", jnp.int8, jnp.int32),
    ):
        if dt == jnp.int8:
            a = jnp.asarray(rng.integers(-127, 127, (m, k), np.int8))
            b = jnp.asarray(rng.integers(-127, 127, (k, n), np.int8))
        else:
            a = jnp.asarray(rng.normal(0, 1, (m, k)), dt)
            b = jnp.asarray(rng.normal(0, 1, (k, n)), dt)
        run = make_mm(m, k, n, dt, acc)
        np.asarray(run(a, b))  # compile
        t0 = time.perf_counter()
        np.asarray(run(a, b))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        out[name] = ms
        print(f"  {name}: {ms:7.3f} ms/rep  {flops / ms * 1e-9:7.1f} TOP/s",
              flush=True)
    print(f"  int8 speedup: {out['bf16'] / out['int8']:.2f}x")


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    for m, k, n in (
        (192, 192, 2048),
        (192, 384, 2048),
        (192, 1536, 256),
        (384, 3072, 128),
    ):
        print(f"({m}, {k}) @ ({k}, {n}) x{ROWS}:", flush=True)
        bench(m, k, n)


if __name__ == "__main__":
    main()
