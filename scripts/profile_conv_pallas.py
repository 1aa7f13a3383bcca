"""Pallas planar direct-conv kernel vs XLA conv at the U-Net's full-res
shapes.

Chained-loop methodology (the only trustworthy pattern on this backend,
see CLAUDE.md): N reps inside one jit with a loop-carried data dependence.
Measures (a) XLA conv, (b) the NHWC wrapper (includes planar<->NHWC
conversions — the single-conv integration cost), (c) the planar kernel
alone (the steady-state cost inside a planar conv chain).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_micro import timed_loop
from rtnr_tpu.ops.conv_pallas import conv3x3_pallas, conv3x3_planar, to_planar


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    H, W = 1088, 1920

    def xla_conv(x, k):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return jnp.maximum(y, 0)

    cases = [
        ("64->64", (64,), 64),
        ("skip64+up64->64", (64, 64), 64),
    ]
    for name, cs, f in cases:
        xs = [jax.random.normal(key, (1, H, W, c), jnp.bfloat16) for c in cs]
        k = jax.random.normal(key, (3, 3, sum(cs), f), jnp.bfloat16) * 0.05
        b = jnp.zeros((f,), jnp.float32)
        flops = 2 * H * W * 9 * sum(cs) * f

        xcat = jnp.concatenate(xs, -1) if len(xs) > 1 else xs[0]
        ms = timed_loop(xla_conv, (xcat, k), reps=10, perturb_arg=1)
        print(f"XLA        {name}: {ms:7.2f} ms  {flops/ms*1e-9:6.1f} TFLOP/s",
              flush=True)

        xps = [to_planar(x) for x in xs]
        for tr in (2, 4, 8):
            try:
                def pconv(*a):
                    return conv3x3_planar(a[:-1], a[-1], b, h=H, w=W,
                                          relu=True, rows_per_step=tr)
                ms = timed_loop(pconv, tuple(xps) + (k,), reps=10,
                                perturb_arg=len(xps))
                print(f"planar TR={tr} {name}: {ms:7.2f} ms  "
                      f"{flops/ms*1e-9:6.1f} TFLOP/s", flush=True)
            except Exception as e:
                print(f"planar TR={tr} {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:300]}", flush=True)
        try:
            def wconv(*a):
                return conv3x3_pallas(a[:-1], a[-1], b, relu=True,
                                      rows_per_step=4)
            ms = timed_loop(wconv, tuple(xs) + (k,), reps=10,
                            perturb_arg=len(xs))
            print(f"nhwc-wrap  {name}: {ms:7.2f} ms  "
                  f"{flops/ms*1e-9:6.1f} TFLOP/s", flush=True)
        except Exception as e:
            print(f"nhwc-wrap  {name}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
