"""Pallas direct 3x3 conv (ops/conv_pallas.py): interpret-mode correctness
against lax.conv_general_dilated, including edges, bias+ReLU epilogue, and
the two-input virtual-concat form."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.ops.conv_pallas import conv3x3_pallas


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


@pytest.mark.parametrize("n_in,cs,f", [(1, (16,), 32), (2, (16, 16), 16)])
@pytest.mark.parametrize("bias,relu", [(False, False), (True, True)])
def test_conv_pallas_interpret(n_in, cs, f, bias, relu):
    rng = np.random.default_rng(0)
    N, H, W = 1, 8, 16
    xs = [
        jnp.asarray(rng.normal(size=(N, H, W, c)).astype(np.float32), jnp.bfloat16)
        for c in cs
    ]
    kernel = jnp.asarray(
        rng.normal(size=(3, 3, sum(cs), f)).astype(np.float32) * 0.2
    )
    b = jnp.asarray(rng.normal(size=(f,)).astype(np.float32)) if bias else None
    got = conv3x3_pallas(
        xs, kernel, b, relu=relu, rows_per_step=2, interpret=True
    )
    want = ref_conv(xs, kernel, b, relu=relu)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # edge masking: a wrong column wrap shows up as large errors in the
    # first/last columns specifically — check them tightly
    np.testing.assert_allclose(
        np.asarray(got[:, :, 0], np.float32),
        np.asarray(want[:, :, 0], np.float32), rtol=2e-2, atol=2e-2,
    )
    np.testing.assert_allclose(
        np.asarray(got[:, :, -1], np.float32),
        np.asarray(want[:, :, -1], np.float32), rtol=2e-2, atol=2e-2,
    )


def test_conv_pallas_batch():
    rng = np.random.default_rng(1)
    N, H, W, C, F = 2, 4, 16, 8, 16
    x = jnp.asarray(rng.normal(size=(N, H, W, C)).astype(np.float32), jnp.bfloat16)
    kernel = jnp.asarray(rng.normal(size=(3, 3, C, F)).astype(np.float32) * 0.2)
    got = conv3x3_pallas([x], kernel, rows_per_step=2, interpret=True)
    want = ref_conv([x], kernel)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
