"""Checkpoint save/load round-trips (msgpack + orbax) and pair generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.data.pairs import batches_for_training, generate_pairs, synthetic_pairs
from rtnr_tpu.models.unet import init_unet
from rtnr_tpu.scene import Scene
from rtnr_tpu.utils.checkpoint import (
    load_msgpack,
    load_orbax,
    load_unet_variables,
    save_msgpack,
    save_orbax,
)


@pytest.fixture(scope="module")
def variables():
    _, v = init_unet(jax.random.PRNGKey(0), 16, 16, features=(4, 8))
    return v


def _assert_tree_equal(a, b):
    la = jax.tree.leaves(a)
    lb = jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_msgpack_roundtrip(tmp_path, variables):
    f = tmp_path / "unet.msgpack"
    save_msgpack(f, variables)
    back = load_msgpack(f)
    _assert_tree_equal(variables, back)
    _assert_tree_equal(variables, load_unet_variables(f))


def test_orbax_roundtrip(tmp_path, variables):
    d = tmp_path / "ckpt"
    save_orbax(d, variables)
    back = load_orbax(d)
    _assert_tree_equal(variables, back)
    _assert_tree_equal(variables, load_unet_variables(d))


def test_generate_pairs_alignment():
    scene = Scene.synthetic(20_000, seed=0, extent=6.0)
    cam = Camera.from_params(30, 30, 16, 16, 32, 32)
    E = np.eye(4)
    E[2, 3] = 8.0
    img = np.zeros((32, 32, 3), np.uint8)
    pairs = generate_pairs(scene, [img], [E], [cam])
    assert len(pairs) == 1
    assert pairs[0].depth.shape == (32, 32)
    assert pairs[0].proj_rgb.shape == (32, 32, 3)
    assert (pairs[0].depth < 3e38).any()  # something projected


def test_synthetic_pairs_and_batches():
    scene = Scene.synthetic(10_000, seed=1, extent=6.0)
    cam = Camera.from_params(30, 30, 16, 16, 32, 32)
    pairs = synthetic_pairs(scene, cam, n=5, base_distance=8.0)
    assert len(pairs) == 5
    batches = list(batches_for_training(pairs, batch_size=2))
    assert len(batches) == 2  # ragged tail dropped
    projs, targets = batches[0]
    assert projs.shape == (2, 4, 4)
    assert targets.shape == (2, 32, 32, 3)
    assert targets.max() <= 1.0
