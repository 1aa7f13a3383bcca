"""UNet split-planar path (conv_impl="pallas" full-res segment): parity
against the XLA path at a small shape, kernels in interpret mode via
RTNR_SPLIT_FORCE (the TPU-shape parity run is
scripts/check_unet_pallas_parity.py)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.models.fold_bn import fold_batchnorm
from rtnr_tpu.models.unet import UNet, init_unet


def test_unet_split_parity_small(monkeypatch):
    monkeypatch.setenv("RTNR_SPLIT_FORCE", "1")
    features = (16, 32)
    H, W = 16, 32
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw = init_unet(jax.random.PRNGKey(0), H, W, features=features)
    variables = fold_batchnorm(raw)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, H, W, 5), jnp.bfloat16)

    def run(impl):
        net = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                   skip_concat="split", conv_impl=impl)
        return np.asarray(net.apply(variables, x), np.float32)

    ya = run("xla")
    yb = run("pallas")
    assert ya.shape == yb.shape == (1, H, W, 3)
    np.testing.assert_allclose(ya, yb, rtol=5e-2, atol=5e-2)
    # shared param tree: both paths must load the same checkpoint
    assert np.abs(ya - yb).mean() < 5e-3
