"""Training-loop tests: loss decreases, grads psum across the mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from rtnr_tpu.camera import Camera
from rtnr_tpu.models.unet import UNet, init_unet
from rtnr_tpu.parallel.mesh import make_mesh
from rtnr_tpu.scene import Scene
from rtnr_tpu.train.trainer import create_train_state, l1_loss, make_train_step


@pytest.fixture(scope="module")
def train_setup():
    mesh = make_mesh((2, 4))
    scene = Scene.synthetic(8192, seed=0, extent=6.0)
    cam = Camera.from_params(30, 30, 16, 16, 32, 32)
    pts, cols, valid = scene.sorted_by_block().device_arrays(pad_to_multiple=8 * 8)
    unet = UNet(features=(8, 16), dtype=jnp.float32)
    _, variables = init_unet(jax.random.PRNGKey(0), 32, 32, features=(8, 16))
    Es = []
    for i in range(4):
        E = np.eye(4)
        E[2, 3] = 8.0 + 0.2 * i
        Es.append(cam.cam_proj(E))
    cam_projs = jnp.asarray(np.stack(Es), jnp.float32)
    return mesh, unet, variables, (jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid)), cam_projs


def test_loss_decreases(train_setup):
    mesh, unet, variables, (pts, cols, valid), cam_projs = train_setup
    state, tx = create_train_state(unet, variables, learning_rate=3e-3)
    step = make_train_step(unet, tx, mesh, width=32, height=32, levels=3)
    targets = jnp.full((4, 32, 32, 3), 0.5, jnp.float32)
    losses = []
    for _ in range(8):
        state, metrics = step(state, pts, cols, valid, cam_projs, targets)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 8
    assert np.isfinite(losses).all()


def test_batch_stats_updated(train_setup):
    mesh, unet, variables, (pts, cols, valid), cam_projs = train_setup
    state, tx = create_train_state(unet, variables)
    step = make_train_step(unet, tx, mesh, width=32, height=32, levels=3)
    targets = jnp.zeros((4, 32, 32, 3), jnp.float32)
    new_state, _ = step(state, pts, cols, valid, cam_projs, targets)
    before = variables["batch_stats"]["down0"]["bn0"]["mean"]
    after = new_state.batch_stats["down0"]["bn0"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_l1_loss_masked():
    pred = jnp.ones((1, 4, 4, 3))
    target = jnp.zeros((1, 4, 4, 3))
    mask = jnp.zeros((1, 4, 4)).at[0, 0, 0].set(1.0)
    assert float(l1_loss(pred, target, mask)) == pytest.approx(1.0, abs=1e-5)
    assert float(l1_loss(pred, target)) == pytest.approx(1.0, abs=1e-6)
