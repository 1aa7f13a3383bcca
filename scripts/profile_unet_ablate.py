"""U-Net end-to-end variant ablation on TPU (trusted fori_loop pattern).

Variants of the folded-BN inference net (random weights, same shapes):
  base   : conv3x3 NHWC bf16 + conv_transpose (what models/unet.py runs)
  d2s    : ConvTranspose replaced by 1x1-matmul + depth-to-space (exact same
           arithmetic contraction, different lowering)
  nchw   : NCHW layout
  int8   : int8 convs w/ int32 accumulation (feasibility probe for a
           quantized serving mode; v5e MXU int8 = 2x bf16 peak)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, reps=10):
    @jax.jit
    def run():
        def body(i, acc):
            return fn(acc)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    np.asarray(run())
    t0 = time.perf_counter()
    np.asarray(run())
    return (time.perf_counter() - t0) / reps * 1e3


FEATS = (64, 128, 256, 512)
H, W = 1088, 1920


def make_params(dtype):
    key = jax.random.PRNGKey(0)
    p = {}

    def mk(name, shape, scale=0.05):
        nonlocal key
        key, k = jax.random.split(key)
        p[name] = (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    cin = 5
    for i, f in enumerate(FEATS):
        mk(f"down{i}a", (3, 3, cin, f))
        mk(f"down{i}b", (3, 3, f, f))
        cin = f
    mk("bottla", (3, 3, 512, 1024))
    mk("bottlb", (3, 3, 1024, 1024))
    for i, f in enumerate(reversed(FEATS)):
        mk(f"up{i}", (2, 2, f * 2, f))
        mk(f"updc{i}a", (3, 3, f * 2, f))
        mk(f"updc{i}b", (3, 3, f, f))
    mk("final", (1, 1, 64, 3))
    return p


def unet_fwd(x, p, transpose_mode="convt", layout="NHWC"):
    dn = (layout, "HWIO", layout)

    def conv(x, k):
        return jax.nn.relu(
            jax.lax.conv_general_dilated(x, k, (1, 1), "SAME", dimension_numbers=dn)
        )

    def pool(x):
        if layout == "NHWC":
            return jax.lax.reduce_window(
                x, -jnp.inf if x.dtype != jnp.int8 else jnp.int8(-128),
                jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID")

    def up(x, k):
        if transpose_mode == "convt":
            return jax.lax.conv_transpose(x, k, (2, 2), "VALID", dimension_numbers=dn)
        # matmul + depth-to-space (same contraction)
        if layout == "NHWC":
            n, h, w, ci = x.shape
            co = k.shape[-1]
            k1 = k.transpose(2, 0, 1, 3).reshape(ci, 4 * co)
            y = (x.reshape(-1, ci) @ k1).reshape(n, h, w, 2, 2, co)
            return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, h * 2, w * 2, co)
        n, ci, h, w = x.shape
        co = k.shape[-1]
        k1 = k.transpose(2, 0, 1, 3).reshape(ci, 4 * co)
        y = jnp.einsum("nchw,ck->nkhw", x, k1).reshape(n, 2, 2, co, h, w)
        return y.transpose(0, 3, 4, 1, 5, 2).reshape(n, co, h * 2, w * 2)

    cat_ax = -1 if layout == "NHWC" else 1
    skips = []
    for i in range(4):
        x = conv(x, p[f"down{i}a"])
        x = conv(x, p[f"down{i}b"])
        skips.append(x)
        x = pool(x)
    x = conv(x, p["bottla"])
    x = conv(x, p["bottlb"])
    for i in range(4):
        x = up(x, p[f"up{i}"])
        x = jnp.concatenate([skips[-(i + 1)], x], axis=cat_ax)
        x = conv(x, p[f"updc{i}a"])
        x = conv(x, p[f"updc{i}b"])
    return jax.lax.conv_general_dilated(x, p["final"], (1, 1), "SAME", dimension_numbers=dn)


def main():
    print(f"backend: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(1)

    for name, dtype, tmode, layout in [
        ("base bf16 NHWC convt", jnp.bfloat16, "convt", "NHWC"),
        ("d2s  bf16 NHWC", jnp.bfloat16, "d2s", "NHWC"),
        ("nchw bf16 convt", jnp.bfloat16, "convt", "NCHW"),
    ]:
        p = make_params(dtype)
        shape = (1, H, W, 5) if layout == "NHWC" else (1, 5, H, W)
        x0 = jax.random.normal(key, shape, dtype)

        def f(acc, p=p, x0=x0, tmode=tmode, layout=layout):
            x = x0 * (jnp.float32(1.0) + jnp.float32(0.0) * acc).astype(x0.dtype)
            y = unet_fwd(x, p, transpose_mode=tmode, layout=layout)
            return acc + y.ravel()[0].astype(jnp.float32)

        try:
            print(f"{name}: {timed(f):.1f} ms", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    # int8 conv probe: one mid-level conv, int8 in / int32 accum
    xi = jax.random.randint(key, (1, 544, 960, 128), -127, 127, jnp.int8)
    ki = jax.random.randint(key, (3, 3, 128, 128), -127, 127, jnp.int8)
    xb = xi.astype(jnp.bfloat16)
    kb = ki.astype(jnp.bfloat16)

    def conv_i8(acc):
        x = xi + (jnp.float32(0.0) * acc).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x, ki, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        return acc + y[0, 0, 0, 0].astype(jnp.float32)

    def conv_bf(acc):
        x = xb * (jnp.float32(1.0) + jnp.float32(0.0) * acc).astype(jnp.bfloat16)
        y = jax.lax.conv_general_dilated(
            x, kb, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return acc + y[0, 0, 0, 0].astype(jnp.float32)

    try:
        print(f"conv3x3 128ch int8 (544x960): {timed(conv_i8, reps=20):.2f} ms", flush=True)
    except Exception as e:
        print(f"int8 conv: FAILED {type(e).__name__}: {e}", flush=True)
    print(f"conv3x3 128ch bf16 (544x960): {timed(conv_bf, reps=20):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
