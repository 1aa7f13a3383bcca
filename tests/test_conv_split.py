"""Split-planar Pallas kernels (ops/conv_split.py): interpret-mode
correctness against XLA references — 3x3 conv (edges, bias+ReLU, two-input
virtual concat, fused pool, fused 1x1 head, channel padding) and the
2x2-stride-2 ConvTranspose (flax flipped-kernel semantics)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from rtnr_tpu.ops.conv_split import (
    conv3x3_split,
    convt2x2_split,
    from_planar_half,
    from_split,
    to_planar_half,
    to_split,
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


@pytest.mark.parametrize("cs,f", [((16,), 16), ((16, 8), 16)])
@pytest.mark.parametrize("bias,relu", [(False, False), (True, True)])
def test_conv_split_interpret(cs, f, bias, relu):
    N, H, W = 1, 8, 32
    xs = [mk((N, H, W, c), 10 + i).astype(jnp.bfloat16) for i, c in enumerate(cs)]
    kernel = mk((3, 3, sum(cs), f), 1, 0.2)
    b = mk((f,), 2) if bias else None

    sp = []
    for x in xs:
        sp.extend(to_split(x))
    outs = conv3x3_split(
        sp, kernel, b, h=H, w=W, relu=relu, rows_per_step=2, interpret=True
    )
    got = from_split(outs[0], outs[1], H, W, f)
    want = ref_conv(xs, kernel, b, relu=relu)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )
    # first/last columns exercise the polyphase edge masks
    for col in (0, 1, W - 2, W - 1):
        np.testing.assert_allclose(
            np.asarray(got[:, :, col], np.float32),
            np.asarray(want[:, :, col], np.float32), rtol=3e-2, atol=3e-2,
        )


def test_conv_split_channel_pad():
    """5-channel input (padded to 8 in the split layout) matches the dense
    5-channel conv — the U-Net's packed-input conv0."""
    N, H, W, F = 1, 8, 32, 16
    x = mk((N, H, W, 5), 3).astype(jnp.bfloat16)
    kernel = mk((3, 3, 5, F), 4, 0.2)
    b = mk((F,), 5)
    e, o = to_split(x)  # pads channels to 8
    outs = conv3x3_split(
        [e, o], kernel, b, h=H, w=W, relu=True, rows_per_step=2, interpret=True
    )
    got = from_split(outs[0], outs[1], H, W, F)
    want = ref_conv([x], kernel, b, relu=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_conv_split_fused_pool():
    N, H, W, C, F = 1, 8, 32, 8, 16
    x = mk((N, H, W, C), 6).astype(jnp.bfloat16)
    kernel = mk((3, 3, C, F), 7, 0.2)
    b = mk((F,), 8)
    e, o = to_split(x)
    ye, yo, pooled = conv3x3_split(
        [e, o], kernel, b, h=H, w=W, relu=True, pool=True, rows_per_step=2,
        interpret=True,
    )
    conv = ref_conv([x], kernel, b, relu=True)
    want_pool = nn.max_pool(conv, window_shape=(2, 2), strides=(2, 2))
    got_full = from_split(ye, yo, H, W, F)
    np.testing.assert_allclose(
        np.asarray(got_full, np.float32), np.asarray(conv, np.float32),
        rtol=3e-2, atol=3e-2,
    )
    got_pool = from_planar_half(pooled, H // 2, W // 2, F)
    np.testing.assert_allclose(
        np.asarray(got_pool, np.float32), np.asarray(want_pool, np.float32),
        rtol=3e-2, atol=3e-2,
    )


def test_conv_split_fused_head():
    """conv + ReLU + fused 1x1 head == conv -> relu -> 1x1 conv (the
    decoder-final fusion; head output channels pad to 8)."""
    N, H, W, C, F, F2 = 1, 8, 32, 8, 16, 3
    x = mk((N, H, W, C), 9).astype(jnp.bfloat16)
    kernel = mk((3, 3, C, F), 11, 0.2)
    b = mk((F,), 12)
    hk = mk((F, F2), 13, 0.3)
    hb = mk((F2,), 14)
    e, o = to_split(x)
    ye, yo = conv3x3_split(
        [e, o], kernel, b, head_kernel=hk, head_bias=hb, h=H, w=W,
        relu=True, rows_per_step=2, interpret=True,
    )
    got = from_split(ye, yo, H, W, 8)[..., :F2]
    conv = ref_conv([x], kernel, b, relu=True)
    want = (
        jnp.einsum("nhwc,cf->nhwf", conv.astype(jnp.bfloat16),
                   hk.astype(jnp.bfloat16)) + hb.astype(jnp.bfloat16)
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-2, atol=5e-2,
    )


def test_convt_split_interpret():
    """Matches flax nn.ConvTranspose (2,2) stride 2 VALID bit-for-bit in
    fp32-land (flipped-kernel semantics)."""
    N, Hh, Wh, C, F = 1, 4, 16, 8, 16
    x = mk((N, Hh, Wh, C), 15).astype(jnp.bfloat16)
    kernel = mk((2, 2, C, F), 16, 0.3)
    b = mk((F,), 17)

    mod = nn.ConvTranspose(F, kernel_size=(2, 2), strides=(2, 2),
                           padding="VALID", dtype=jnp.bfloat16)
    want = mod.apply({"params": {"kernel": kernel, "bias": b}}, x)

    xp = to_planar_half(x)
    ye, yo = convt2x2_split(
        xp, kernel, b, h=2 * Hh, w=2 * Wh, rows_per_step=2, interpret=True
    )
    got = from_split(ye, yo, 2 * Hh, 2 * Wh, F)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=3e-2, atol=3e-2,
    )
