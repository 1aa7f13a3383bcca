"""Batched phase U-Net at deployment scale (VERDICT r4 item 6).

The phase path unrolls frames over SHARED submodules (models/unet.py
_phase_forward), so per-frame cost should match single-frame while
program size and compile time scale with batch. This measures all three
at 1088x1920 for batch 1 / 2 / 4: chained-loop per-frame ms, compile
wall time, and (as a program-size proxy) the jitted computation's HLO
module size.

Usage: PYTHONPATH=... [UNET_INT8=0|2] python scripts/bench_batched.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from rtnr_tpu.models.fold_bn import fold_batchnorm
from rtnr_tpu.models.unet import UNet, calibrate_act_scales, init_unet

REPS = int(os.environ.get("BENCH_REPS", 10))


def main():
    H, W = 1088, 1920
    features = (64, 128, 256, 512)
    int8 = os.environ.get("UNET_INT8", "2") == "2"
    print(f"backend: {jax.devices()[0]}  int8={int8}", flush=True)
    unet = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                quant_int8=int8)
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = jax.device_put(fold_batchnorm(raw))

    x1 = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 5), jnp.bfloat16)
    scales = calibrate_act_scales(unet, variables, x1) if int8 else None

    for batch in (1, 2, 4):
        x0 = jnp.broadcast_to(x1, (batch, H, W, 5)) + 0.0

        def body(k, x):
            y = unet.apply(variables, x, act_scales=scales)
            return jnp.concatenate([y * jnp.bfloat16(1e-3), x[..., 3:]],
                                   axis=-1)

        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, REPS, body, x)

        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(run(x0))
        ms = (time.perf_counter() - t0) / REPS / batch * 1e3
        print(f"batch {batch}: {ms:7.2f} ms/frame  "
              f"(compile+first run {compile_s:.1f} s)", flush=True)


if __name__ == "__main__":
    main()
