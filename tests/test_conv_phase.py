"""P-phase packed polyphase kernels (ops/conv_phase.py): interpret-mode
correctness at P in {1, 2, 4} against XLA references — conv (edges,
bias+ReLU, two-input, fused pool, fused head, channel pad), ConvTranspose
(flipped-kernel flax semantics), and layout round-trips."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from rtnr_tpu.ops.conv_phase import (
    conv3x3_phase,
    convt2x2_phase,
    from_phase,
    to_phase,
)


def ref_conv(xs, kernel, bias=None, relu=False):
    x = jnp.concatenate([x.astype(jnp.bfloat16) for x in xs], axis=-1)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(jnp.bfloat16), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias.astype(jnp.bfloat16)
    if relu:
        y = jnp.maximum(y, 0)
    return y


def mk(shape, seed, scale=1.0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)


def test_phase_roundtrip():
    x = mk((1, 6, 24, 16), 0).astype(jnp.bfloat16)
    for P in (1, 2, 4):
        y = from_phase(to_phase(x, P), 6, 24, 16, P)
        np.testing.assert_array_equal(np.asarray(y, np.float32),
                                      np.asarray(x, np.float32))


@pytest.mark.parametrize("P", [1, 2, 4])
@pytest.mark.parametrize("cs,f", [((16,), 16), ((16, 8), 16)])
def test_conv_phase_interpret(P, cs, f):
    N, H, W = 1, 8, 32
    xs = [mk((N, H, W, c), 10 + i).astype(jnp.bfloat16) for i, c in enumerate(cs)]
    kernel = mk((3, 3, sum(cs), f), 1, 0.2)
    b = mk((f,), 2)
    xp = [to_phase(x, P) for x in xs]
    (out,) = conv3x3_phase(
        xp, kernel, b, h=H, w=W, P=P, relu=True, rows_per_step=2,
        interpret=True,
    )
    got = from_phase(out, H, W, f, P)
    want = ref_conv(xs, kernel, b, relu=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )
    # edge columns exercise the phase-boundary wrap rolls and masks
    for col in (0, 1, W - 2, W - 1):
        np.testing.assert_allclose(
            np.asarray(got[:, :, col], np.float32),
            np.asarray(want[:, :, col], np.float32), rtol=3e-2, atol=3e-2,
        )


def test_conv_phase_channel_pad():
    N, H, W, F, P = 1, 8, 32, 16, 4
    x = mk((N, H, W, 5), 3).astype(jnp.bfloat16)
    kernel = mk((3, 3, 5, F), 4, 0.2)
    b = mk((F,), 5)
    (out,) = conv3x3_phase(
        [to_phase(x, P)], kernel, b, h=H, w=W, P=P, relu=True,
        rows_per_step=2, interpret=True,
    )
    got = from_phase(out, H, W, F, P)
    want = ref_conv([x], kernel, b, relu=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.parametrize("P", [2, 4])
def test_conv_phase_fused_pool(P):
    N, H, W, C, F = 1, 8, 32, 8, 16
    x = mk((N, H, W, C), 6).astype(jnp.bfloat16)
    kernel = mk((3, 3, C, F), 7, 0.2)
    b = mk((F,), 8)
    out, pooled = conv3x3_phase(
        [to_phase(x, P)], kernel, b, h=H, w=W, P=P, relu=True, pool=True,
        rows_per_step=2, interpret=True,
    )
    conv = ref_conv([x], kernel, b, relu=True)
    np.testing.assert_allclose(
        np.asarray(from_phase(out, H, W, F, P), np.float32),
        np.asarray(conv, np.float32), rtol=3e-2, atol=3e-2,
    )
    want_pool = nn.max_pool(conv, window_shape=(2, 2), strides=(2, 2))
    got_pool = from_phase(pooled, H // 2, W // 2, F, P // 2)
    np.testing.assert_allclose(
        np.asarray(got_pool, np.float32), np.asarray(want_pool, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_conv_phase_fused_head():
    N, H, W, C, F, F2, P = 1, 8, 32, 8, 16, 3, 2
    x = mk((N, H, W, C), 9).astype(jnp.bfloat16)
    kernel = mk((3, 3, C, F), 11, 0.2)
    b = mk((F,), 12)
    hk = mk((F, F2), 13, 0.3)
    hb = mk((F2,), 14)
    (out,) = conv3x3_phase(
        [to_phase(x, P)], kernel, b, head_kernel=hk, head_bias=hb,
        h=H, w=W, P=P, relu=True, rows_per_step=2, interpret=True,
    )
    got = from_phase(out, H, W, 8, P)[..., :F2]
    conv = ref_conv([x], kernel, b, relu=True)
    want = (
        jnp.einsum("nhwc,cf->nhwf", conv.astype(jnp.bfloat16),
                   hk.astype(jnp.bfloat16)) + hb.astype(jnp.bfloat16)
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=5e-2,
    )


@pytest.mark.parametrize("P_in", [1, 2])
def test_convt_phase_interpret(P_in):
    N, Hh, Wh, C, F = 1, 4, 16, 8, 16
    x = mk((N, Hh, Wh, C), 15).astype(jnp.bfloat16)
    kernel = mk((2, 2, C, F), 16, 0.3)
    b = mk((F,), 17)
    mod = nn.ConvTranspose(F, kernel_size=(2, 2), strides=(2, 2),
                           padding="VALID", dtype=jnp.bfloat16)
    want = mod.apply({"params": {"kernel": kernel, "bias": b}}, x)
    out = convt2x2_phase(
        to_phase(x, P_in), kernel, b, h=2 * Hh, w=2 * Wh, P=P_in,
        rows_per_step=2, interpret=True,
    )
    got = from_phase(out, 2 * Hh, 2 * Wh, F, 2 * P_in)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


@pytest.mark.parametrize("P_in", [1, 2])
def test_conv_phase_fused_up_bitexact(P_in):
    """Fused-ConvTranspose conv0 == standalone convt2x2_phase followed by
    the unfused two-input conv, bit-exact (same matmuls + bf16 roundings)."""
    N, Hh, Wh, Cd, F = 1, 4, 16, 16, 8
    H, W, P = 2 * Hh, 2 * Wh, 2 * P_in
    deep = mk((N, Hh, Wh, Cd), 21).astype(jnp.bfloat16)
    skip = mk((N, H, W, F), 22).astype(jnp.bfloat16)
    kt = mk((2, 2, Cd, F), 23, 0.3)
    bt = mk((F,), 24)
    kernel = mk((3, 3, 2 * F, F), 25, 0.2)
    b = mk((F,), 26)

    deep_p = to_phase(deep, P_in)
    skip_p = to_phase(skip, P)
    up_p = convt2x2_phase(deep_p, kt, bt, h=H, w=W, P=P_in,
                          rows_per_step=2, interpret=True)
    (want,) = conv3x3_phase([skip_p, up_p], kernel, b, h=H, w=W, P=P,
                            relu=True, rows_per_step=2, interpret=True)
    (got,) = conv3x3_phase([skip_p, deep_p], kernel, b,
                           up_kernel=kt, up_bias=bt, h=H, w=W, P=P,
                           relu=True, rows_per_step=2, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(want, np.float32)
    )


def test_conv_phase_int8_error_budget():
    """int8 path (per-channel weights, per-lane dynamic activations):
    bounded error vs the exact kernel, and exact zero where ReLU clamps."""
    rng = np.random.default_rng(11)
    h, w, P, C, F = 16, 64, 4, 16, 16
    x = jnp.asarray(rng.normal(0, 1, (1, h, w, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, C, F)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (F,)).astype(np.float32))
    xp = to_phase(x, P)
    (y_ref,) = conv3x3_phase([xp], k, b, h=h, w=w, P=P, relu=True,
                             interpret=True)
    (y_q,) = conv3x3_phase([xp], k, b, h=h, w=w, P=P, relu=True,
                           interpret=True, quant=True)
    a = np.asarray(from_phase(y_ref, h, w, F, P), np.float32)
    q = np.asarray(from_phase(y_q, h, w, F, P), np.float32)
    scale = np.abs(a).max()
    assert np.abs(a - q).max() <= 0.03 * scale
    assert np.abs(a - q).mean() <= 0.005 * scale


def test_conv_phase_int8_two_inputs_pool():
    """int8 with the virtual-concat two-input form + fused pool."""
    rng = np.random.default_rng(12)
    h, w, P, C0, C1, F = 16, 64, 4, 16, 8, 16
    xa = jnp.asarray(rng.normal(0, 1, (1, h, w, C0)).astype(np.float32))
    xb = jnp.asarray(rng.normal(0, 1, (1, h, w, C1)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, C0 + C1, F)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.1, (F,)).astype(np.float32))
    pa, pb = to_phase(xa, P), to_phase(xb, P)
    ref, ref_pool = conv3x3_phase([pa, pb], k, b, h=h, w=w, P=P, relu=True,
                                  pool=True, interpret=True)
    yq, yq_pool = conv3x3_phase([pa, pb], k, b, h=h, w=w, P=P, relu=True,
                                pool=True, interpret=True, quant=True)
    a = np.asarray(from_phase(ref, h, w, F, P), np.float32)
    q = np.asarray(from_phase(yq, h, w, F, P), np.float32)
    scale = np.abs(a).max()
    assert np.abs(a - q).max() <= 0.03 * scale
    ap = np.asarray(from_phase(ref_pool, h // 2, w // 2, F, P // 2), np.float32)
    qp = np.asarray(from_phase(yq_pool, h // 2, w // 2, F, P // 2), np.float32)
    assert np.abs(ap - qp).max() <= 0.03 * scale
