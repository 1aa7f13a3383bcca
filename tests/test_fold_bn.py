"""BN folding: folded inference UNet matches the unfolded one."""

import numpy as np

import jax
import jax.numpy as jnp

from rtnr_tpu.models.fold_bn import fold_batchnorm
from rtnr_tpu.models.unet import UNet, init_unet


def test_folded_matches_unfolded():
    features = (8, 16)
    model, variables = init_unet(jax.random.PRNGKey(0), 32, 32, features=features)
    # randomize stats so folding is non-trivial
    rng = np.random.default_rng(0)
    variables = jax.tree.map(np.asarray, variables)

    def jitter(d):
        for k, v in d.items():
            if isinstance(v, dict):
                jitter(v)
            elif k == "mean":
                d[k] = v + rng.uniform(-0.3, 0.3, v.shape).astype(np.float32)
            elif k == "var":
                d[k] = v * rng.uniform(0.5, 1.5, v.shape).astype(np.float32)

    variables = jax.tree.map(lambda x: x, variables)  # to plain dict copies
    jitter(variables["batch_stats"])

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 5), jnp.float32)
    y_ref = model.apply(variables, x)

    folded = fold_batchnorm(variables)
    fmodel = UNet(features=features, dtype=jnp.float32, fold_bn=True)
    y_fold = fmodel.apply(folded, x)
    np.testing.assert_allclose(np.asarray(y_fold), np.asarray(y_ref), rtol=2e-4, atol=2e-4)


def test_folded_param_count_smaller():
    _, variables = init_unet(jax.random.PRNGKey(0), 16, 16, features=(4, 8))
    folded = fold_batchnorm(jax.tree.map(np.asarray, variables))
    n_ref = sum(x.size for x in jax.tree.leaves(variables))
    n_fold = sum(x.size for x in jax.tree.leaves(folded))
    assert n_fold < n_ref  # bn stats + scales folded away
