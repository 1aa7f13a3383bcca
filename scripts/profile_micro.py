"""Trustworthy micro-benchmarks on the axon TPU backend.

Only pattern that measures real device time here (see CLAUDE.md): N reps
chained inside ONE jit via lax.fori_loop with a genuine loop-carried data
dependence (so XLA cannot hoist the op out of the loop), returning a scalar
that is fetched with np.asarray. Reported per-rep time subtracts nothing —
keep reps high enough that loop overhead vanishes.

Usage: python scripts/profile_micro.py [unet|raster|all]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed_loop(fn, args, reps=20, perturb_arg=0):
    """fn(*args) -> array. Chains reps executions with a data dependence on
    the perturbed arg; returns per-rep milliseconds."""

    @jax.jit
    def run(*a):
        def body(i, acc):
            arg = a[perturb_arg]
            scale = (jnp.float32(1.0) + jnp.float32(0.0) * acc).astype(arg.dtype)
            aa = a[:perturb_arg] + (arg * scale,) + a[perturb_arg + 1 :]
            out = fn(*aa)
            return acc + out.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    np.asarray(run(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def timed_loop_int(fn, args, reps=20, perturb_arg=0):
    """Same but for an int32 perturbed arg (adds 0*acc)."""

    @jax.jit
    def run(*a):
        def body(i, acc):
            arg = a[perturb_arg]
            bump = (jnp.float32(0.0) * acc).astype(jnp.int32)
            aa = a[:perturb_arg] + (arg + bump,) + a[perturb_arg + 1 :]
            out = fn(*aa)
            return acc + out.ravel()[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    np.asarray(run(*args))
    t0 = time.perf_counter()
    np.asarray(run(*args))
    return (time.perf_counter() - t0) / reps * 1e3


def prof_unet():
    H, W = 1088, 1920
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    def conv_t2(x, k):
        return jax.lax.conv_transpose(
            x, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )

    feats = [64, 128, 256, 512]
    shapes = []
    cin, h, w = 5, H, W
    for i, f in enumerate(feats):
        shapes.append((f"down{i}a", h, w, cin, f, 3))
        shapes.append((f"down{i}b", h, w, f, f, 3))
        cin, h, w = f, h // 2, w // 2
    shapes.append(("bottla", h, w, 512, 1024, 3))
    shapes.append(("bottlb", h, w, 1024, 1024, 3))
    for i, f in enumerate(reversed(feats)):
        shapes.append((f"up{i}_T", h, w, f * 2, f, -2))
        h, w = h * 2, w * 2
        shapes.append((f"updc{i}a", h, w, f * 2, f, 3))
        shapes.append((f"updc{i}b", h, w, f, f, 3))
    shapes.append(("final", H, W, 64, 3, 1))

    total = 0.0
    for name, h, w, ci, co, ksz in shapes:
        x = jax.random.normal(key, (1, h, w, ci), dt)
        if ksz == -2:
            k = jax.random.normal(key, (2, 2, ci, co), dt) * 0.02
            f, flops = conv_t2, 2 * (h * 2) * (w * 2) * ci * co
        else:
            k = jax.random.normal(key, (ksz, ksz, ci, co), dt) * 0.02
            f, flops = conv, 2 * h * w * ci * co * ksz * ksz
        ms = timed_loop(f, (x, k), reps=10, perturb_arg=1)
        total += ms
        print(f"{name:9s} {h:4d}x{w:4d} {ci:4d}->{co:4d} k{abs(ksz)}: "
              f"{ms:7.2f} ms  {flops/ms*1e-9:6.1f} TFLOP/s", flush=True)
    print(f"sum of convs: {total:.1f} ms")

    # transpose-conv alternative: 1x1 matmul + depth-to-space
    h, w, ci, co = 544, 960, 128, 64
    x = jax.random.normal(key, (1, h, w, ci), dt)
    k = jax.random.normal(key, (2, 2, ci, co), dt) * 0.02

    def t_d2s(x, k):
        k1 = k.transpose(2, 0, 1, 3).reshape(ci, 4 * co)
        y = (x.reshape(-1, ci) @ k1).reshape(1, h, w, 2, 2, co)
        return y.transpose(0, 1, 3, 2, 4, 5).reshape(1, h * 2, w * 2, co)

    print(f"up3_T as ConvT: {timed_loop(conv_t2, (x, k), 10, 1):.2f} ms; "
          f"as matmul+d2s: {timed_loop(t_d2s, (x, k), 10, 1):.2f} ms")


def prof_raster():
    n = 5_000_000
    hw = 1920 * 1080
    rng = np.random.default_rng(0)
    pix = jnp.asarray(rng.integers(0, hw, n, dtype=np.int32))
    z = jnp.asarray(rng.uniform(1, 30, n).astype(np.float32))
    zb = jax.lax.bitcast_convert_type(z, jnp.int32)
    c0 = jnp.asarray(rng.integers(0, 256, n, dtype=np.int32))
    print(f"N={n/1e6}M HW={hw/1e6:.2f}M", flush=True)

    cases = {
        "sort 1key 0pay": (lambda p: jax.lax.sort((p,), num_keys=1)[0], (pix,)),
        "sort 1key 2pay": (
            lambda p, a, b: jax.lax.sort((p, a, b), num_keys=1)[0], (pix, zb, c0)),
        "sort 2key 1pay": (
            lambda p, a, b: jax.lax.sort((p, a, b), num_keys=2)[0], (pix, zb, c0)),
        "sort 2key 1pay M=7.07M": (
            lambda p, a, b: jax.lax.sort(
                (jnp.concatenate([p, jnp.arange(hw, dtype=jnp.int32)]),
                 jnp.concatenate([a, jnp.zeros(hw, jnp.int32)]),
                 jnp.concatenate([b, jnp.zeros(hw, jnp.int32)])),
                num_keys=2)[0],
            (pix, zb, c0)),
        "cumsum N i32": (lambda x: jnp.cumsum(x), (c0,)),
        "cummax N i32": (lambda x: jax.lax.cummax(x), (pix,)),
        "seg-bcast 5x doubling (23 steps)": (None, None),
    }
    for name, (f, args) in cases.items():
        if f is None:
            continue
        ms = timed_loop_int(f, args, reps=5)
        print(f"{name}: {ms:.1f} ms", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(f"backend: {jax.devices()[0]}")
    if which in ("unet", "all"):
        prof_unet()
    if which in ("raster", "all"):
        prof_raster()


if __name__ == "__main__":
    main()
