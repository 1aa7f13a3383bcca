"""Feasibility numbers for a two-pass bucketed sort of the 5M-pt stream
(VERDICT r5 item 1b — the coherence/partition formulation not yet measured).

Scheme under evaluation:
  pass 1: batched row sort of (C, L) chunks by bucket (pix top bits)
  regroup: pad each (chunk, bucket) run to R_max, transpose (C,B,R)->(B,C,R)
  pass 2: batched row sort of (B, C*R_max) buckets by (pix, zb)
Global order = bucket-major, exact. This script measures the building
blocks with the chained-loop methodology so the scheme's total can be
compared against the global sort's 11.2 ms before building the kernels.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N = int(os.environ.get("BENCH_POINTS", 5_000_000))
REPS = int(os.environ.get("BENCH_REPS", 10))


def chained(fn, *args):
    @jax.jit
    def run(s0, a0):
        def body(k, acc):
            # ORDER-CHANGING perturbation: xor is not monotone, so the
            # sort cannot be hoisted/simplified out of the loop (an
            # additive `+ acc` perturbation is order-invariant — XLA
            # hoists the whole sort and the loop times as ~0.06 ms)
            outs = fn(a0[0] ^ (acc & 7) ^ s0, *a0[1:])
            return acc + outs
        return jax.lax.fori_loop(0, REPS, body, jnp.int32(0))

    jax.block_until_ready(run(jnp.int32(0), args))
    t0 = time.perf_counter()
    jax.block_until_ready(run(jnp.int32(1), args))
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    print(f"backend: {jax.devices()[0]} n={N}", flush=True)
    rng = np.random.default_rng(0)
    hw = 1920 * 1080
    # realistic block-coherent pixel stream: sorted-by-block scene projected
    pix = np.sort(rng.integers(0, hw, N).astype(np.int32))  # coherent-ish
    perm = np.argsort(
        rng.standard_normal(-(-N // 1024)).repeat(1024)[:N], kind="stable"
    )
    pix = np.ascontiguousarray(pix[perm])  # locally coherent, globally mixed
    zb = rng.integers(0, 1 << 30, N).astype(np.int32)
    pk = rng.integers(0, 1 << 24, N).astype(np.int32)
    a_pix, a_zb, a_pk = map(jnp.asarray, (pix, zb, pk))

    # baseline: global 2-key 3-lane sort (the production sort)
    def global_sort(p, z, c):
        ps, zs, cs = jax.lax.sort((p, z, c), num_keys=2, is_stable=False)
        return ps[0] + zs[-1] + cs[N // 2]

    print(f"global 2-key 3-lane: {chained(global_sort, a_pix, a_zb, a_pk):7.2f} ms",
          flush=True)

    # pass-1 analog: batched row sorts (C, L), 2-key 3-lane
    for L in (32768, 16384):
        C = -(-N // L)
        pad = C * L - N

        def batched_sort(p, z, c):
            pp = jnp.concatenate([p, jnp.full((pad,), hw, jnp.int32)]).reshape(C, L)
            zz = jnp.concatenate([z, jnp.zeros((pad,), jnp.int32)]).reshape(C, L)
            cc = jnp.concatenate([c, jnp.zeros((pad,), jnp.int32)]).reshape(C, L)
            ps, zs, cs = jax.lax.sort((pp, zz, cc), dimension=1, num_keys=2,
                                      is_stable=False)
            return ps[0, 0] + zs[-1, -1] + cs[C // 2, L // 2]

        print(f"batched ({C}, {L}) 2-key 3-lane: "
              f"{chained(batched_sort, a_pix, a_zb, a_pk):7.2f} ms", flush=True)

    # pass-2 analog at padded size: (B, C*R) batched sort of ~2x elements
    B, R = 256, 160  # R_max 2x the 80-elem (c,b) average at C=153... scaled
    C1 = -(-N // 32768)
    M2 = B * C1 * R
    print(f"# pass-2 padded elements: {M2/1e6:.1f}M", flush=True)
    p2 = jnp.asarray(rng.integers(0, hw, M2).astype(np.int32)).reshape(B, C1 * R)
    z2 = jnp.asarray(rng.integers(0, 1 << 30, M2).astype(np.int32)).reshape(B, C1 * R)
    c2 = jnp.asarray(rng.integers(0, 1 << 24, M2).astype(np.int32)).reshape(B, C1 * R)

    def pass2(p, z, c):
        ps, zs, cs = jax.lax.sort((p, z, c), dimension=1, num_keys=2,
                                  is_stable=False)
        return ps[0, 0] + zs[-1, -1] + cs[B // 2, 7]

    print(f"pass-2 batched ({B}, {C1 * R}): {chained(pass2, p2, z2, c2):7.2f} ms",
          flush=True)

    # regroup-transpose analog: (C,B,R) -> (B,C,R) of the padded stream x3
    t0 = jnp.asarray(rng.integers(0, 1 << 30, M2).astype(np.int32)).reshape(C1, B, R)

    def transpose3(t, z, c):
        f = lambda x: jnp.transpose(x.reshape(C1, B, R), (1, 0, 2))
        return (f(t)[0, 0, 0] + f(z.reshape(C1, B, R) * 1)[0, 0, 0]
                + f(c.reshape(C1, B, R))[0, 0, 0])

    z3 = z2.reshape(C1, B, R)
    c3 = c2.reshape(C1, B, R)
    print(f"transpose x3 ({C1},{B},{R}): {chained(transpose3, t0, z3, c3):7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
