"""Per-level conv3x3_phase timing, bf16 vs int8, chained-loop methodology.

Times the C=F conv (conv1 shape) at every pyramid level of the 1080p bench
net — the output feeds back as the next input, giving a natural loop-carried
dependence. K = 3F contracts, N = P*128 lanes: full-res is small-K/large-N,
deep levels large-K/small-N, so this separates which regime int8 helps.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from rtnr_tpu.ops.conv_phase import conv3x3_phase

REPS = int(os.environ.get("BENCH_REPS", 20))


def bench(h, P, F, quant):
    """Marginal per-conv cost: (time at 3 convs/iter - time at 1)/2 —
    differencing removes the per-iteration floor this backend carries on
    isolated loops (CLAUDE.md timing notes). ``quant='static'`` feeds int8
    activations (the deployment static path: int8 in HBM, int8 out)."""
    rng = np.random.default_rng(0)
    lb = P * 128
    k = jnp.asarray(rng.normal(0, 0.05, (3, 3, F, F)).astype(np.float32))
    b = jnp.zeros((F,), jnp.float32)
    w = P * 120 if P * 120 <= lb else lb  # bench WU=120 at full res
    static = quant == "static"
    if static:
        x0 = jnp.asarray(
            rng.integers(-127, 128, ((h + 2) * F, lb)), jnp.int8
        )
        scale = jnp.float32(0.05)
        kw = dict(quant="static", in_scales=[scale], out_scale=scale)
    else:
        x0 = jnp.asarray(rng.normal(0, 1, ((h + 2) * F, lb)), jnp.bfloat16)
        kw = dict(quant=quant)

    def timed(n_inner):
        @jax.jit
        def run(x):
            def body(i, x):
                for _ in range(n_inner):
                    (x,) = conv3x3_phase([x], k, b, h=h, w=w, P=P, relu=True,
                                         **kw)
                    if not static:
                        x = x * jnp.bfloat16(0.5)  # keep activations bounded
                return x

            return jax.lax.fori_loop(0, REPS, body, x)

        jax.block_until_ready(run(x0))
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        return (time.perf_counter() - t0) / REPS * 1e3

    ms = (timed(3) - timed(1)) / 2
    flops = 2 * 9 * F * F * h * w
    return ms, flops / ms * 1e-9


def main():
    print(f"backend: {jax.devices()[0]}  reps={REPS}", flush=True)
    levels = [
        ("L0 full-res", 1088, 16, 64),
        ("L1", 544, 8, 128),
        ("L2", 272, 4, 256),
        ("L3", 136, 2, 512),
        ("bottleneck", 68, 1, 1024),
    ]
    only = os.environ.get("LEVELS")
    if only:
        keep = set(only.split(","))
        levels = [lv for lv in levels if lv[0].split()[0] in keep]
    modes = os.environ.get("MODES", "bf16,dyn,static").split(",")
    qmap = {"bf16": False, "dyn": True, "static": "static"}
    for name, h, P, F in levels:
        row = f"{name:12s} h={h:4d} P={P:2d} F={F:4d}:"
        for mode in modes:
            ms, tf = bench(h, P, F, qmap[mode])
            row += f"  {mode} {ms:6.2f} ms ({tf:5.1f} TF/s)"
        print(row, flush=True)


if __name__ == "__main__":
    main()
