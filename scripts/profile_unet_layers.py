"""Per-layer U-Net timing on TPU (trusted fori_loop-chained pattern).

Times every conv / pool / transpose of the folded-BN inference net at its
bench shape (1088x1920 input) individually, each as a fori_loop-chained jit
with a loop-carried data dependence (see CLAUDE.md: the only trustworthy
microbenchmark pattern on this backend). Prints a table + the sum, to be
compared against the whole-net time.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 1088, 1920


def timed(fn, x_shape, k_shape, reps=10):
    key = jax.random.PRNGKey(0)
    x0 = (jax.random.normal(key, x_shape, jnp.float32) * 0.05).astype(jnp.bfloat16)
    k = (
        (jax.random.normal(jax.random.PRNGKey(1), k_shape, jnp.float32) * 0.05).astype(
            jnp.bfloat16
        )
        if k_shape
        else None
    )

    # inputs passed as jit ARGUMENTS (not closure captures) so repeat runs
    # aren't memoized by the remote backend — see CLAUDE.md / profile_micro.py
    @jax.jit
    def run(x0, k):
        def body(i, carry):
            acc, x = carry
            # loop-carried dependence: perturb input by acc (kept ~0)
            xi = x + (acc * jnp.float32(0.0)).astype(x.dtype)
            y = fn(xi, k) if k is not None else fn(xi)
            return acc + y.ravel()[0].astype(jnp.float32), x

        acc, _ = jax.lax.fori_loop(0, reps, body, (jnp.float32(0.0), x0))
        return acc

    np.asarray(run(x0, k))
    t0 = time.perf_counter()
    np.asarray(run(x0, k))
    return (time.perf_counter() - t0) / reps * 1e3


def conv(x, k):
    return jax.nn.relu(
        jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
    )


def convt(x, k):
    return jax.lax.conv_transpose(
        x, k, (2, 2), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    layers = []
    feats = (64, 128, 256, 512)
    h, w, cin = H, W, 5
    for i, f in enumerate(feats):
        layers.append((f"down{i}a {cin}->{f} @{h}x{w}", conv, (1, h, w, cin), (3, 3, cin, f)))
        layers.append((f"down{i}b {f}->{f} @{h}x{w}", conv, (1, h, w, f), (3, 3, f, f)))
        layers.append((f"pool{i} @{h}x{w}x{f}", pool, (1, h, w, f), None))
        h, w, cin = h // 2, w // 2, f
    layers.append((f"bottla 512->1024 @{h}x{w}", conv, (1, h, w, 512), (3, 3, 512, 1024)))
    layers.append((f"bottlb 1024->1024 @{h}x{w}", conv, (1, h, w, 1024), (3, 3, 1024, 1024)))
    for i, f in enumerate(reversed(feats)):
        layers.append((f"up{i} convT {f*2}->{f} @{h}x{w}", convt, (1, h, w, f * 2), (2, 2, f * 2, f)))
        h, w = h * 2, w * 2
        layers.append((f"updc{i}a {f*2}->{f} @{h}x{w}", conv, (1, h, w, f * 2), (3, 3, f * 2, f)))
        layers.append((f"updc{i}b {f}->{f} @{h}x{w}", conv, (1, h, w, f), (3, 3, f, f)))
    layers.append((f"final 1x1 64->3 @{h}x{w}", conv, (1, h, w, 64), (1, 1, 64, 3)))

    total = 0.0
    for name, fn, xs, ks in layers:
        try:
            t = timed(fn, xs, ks)
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} FAILED {type(e).__name__}: {e}", flush=True)
            continue
        total += t
        # flops for convs
        if ks is not None:
            # in_H*in_W*Cin*Cout*kh*kw*2 — exact for stride-1 convs and for
            # the 2x2/stride-2 transpose (where stride == kernel size, each
            # input position contributes all kh*kw taps exactly once)
            fl = xs[1] * xs[2] * ks[2] * ks[3] * ks[0] * ks[1] * 2
            eff = fl / (t * 1e-3) / 197e12 * 100
            print(f"{name:42s} {t:7.2f} ms  {fl/1e9:7.1f} GF  {eff:5.1f}% MXU", flush=True)
        else:
            print(f"{name:42s} {t:7.2f} ms", flush=True)
    print(f"{'SUM':42s} {total:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
