"""MXU throughput vs (K, N) shape for the direct-conv reformulations.

A 3x3 conv C->F can be expressed as one matmul at several (K, N) stackings;
this measures XLA bf16 dot_general throughput at each candidate to pick the
Pallas conv kernel's internal shape (see ops/conv_pallas.py):

  K=9C,  N=F    full im2col            (576, 64)   for C=F=64
  K=3C,  N=3F   dx-stacked K, dy-N     (192, 192)
  K=12C, N=2F   row-paired outputs     (768, 128)  (25% zero weights)
  K=3C,  N=3F   updc split (C=128)     (384, 192)
plus perfectly-tiled controls.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from scripts.profile_micro import timed_loop


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    M = 1_044_480  # 1088*1920/2 pixels
    shapes = [
        (576, 64), (192, 192), (768, 128), (384, 192), (384, 64),
        (128, 128), (256, 256), (512, 512), (576, 128), (192, 384),
    ]
    for K, N in shapes:
        x = jax.random.normal(key, (M, K), jnp.bfloat16)
        w = jax.random.normal(key, (K, N), jnp.bfloat16) * 0.02

        def mm(x, w):
            return jax.lax.dot_general(
                x, w, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        ms = timed_loop(mm, (x, w), reps=20, perturb_arg=1)
        fl = 2 * M * K * N
        print(f"K={K:4d} N={N:4d}: {ms:7.3f} ms  {fl/ms*1e-9:7.1f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
