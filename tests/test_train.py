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


@pytest.fixture(scope="module")
def scene_step_setup(train_setup):
    import optax

    from rtnr_tpu.train.trainer import SceneTrainState, make_scene_train_step

    mesh, unet, variables, (pts, cols, valid), cam_projs = train_setup
    tx = optax.adam(1e-3)
    leaves = (variables["params"], jnp.asarray(cols, jnp.float32), cam_projs)
    state = SceneTrainState(
        params=leaves[0], batch_stats=variables["batch_stats"],
        colors=leaves[1], cam_projs=leaves[2], opt_state=tx.init(leaves),
    )
    step = make_scene_train_step(unet, tx, mesh, width=32, height=32, levels=3)
    targets = jnp.full((4, 32, 32, 3), 0.4, jnp.float32)
    return mesh, unet, state, step, (pts, valid), targets


def test_scene_step_runs_and_moves_scene(scene_step_setup):
    """One sharded scene-finetune step: finite loss, nonzero pose and color
    gradients, colors/poses actually move (BASELINE config 4 on a mesh)."""
    mesh, unet, state, step, (pts, valid), targets = scene_step_setup
    new_state, metrics = step(state, pts, valid, targets)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["pose_grad_norm"]) > 0.0
    assert float(metrics["color_grad_norm"]) > 0.0
    assert not np.allclose(np.asarray(new_state.colors), np.asarray(state.colors))
    assert not np.allclose(np.asarray(new_state.cam_projs), np.asarray(state.cam_projs))


def test_scene_step_pose_gradient_fd(scene_step_setup):
    """d(loss)/d(cam_proj) through the SHARDED differentiable pipeline
    (raster -> prefilter normalized-depth channel) matches central finite
    differences on the 8-device mesh. Points sit at exact pixel centers so
    the perturbation cannot flip the piecewise-constant pixel assignment
    (same construction as tests/test_parallel_diff.py)."""
    from rtnr_tpu.ops.prefilter import depth_prefilter
    from rtnr_tpu.parallel.diff import rasterize_diff_sharded_batch
    from rtnr_tpu.parallel.mesh import make_mesh
    from rtnr_tpu.pipeline import pad_to_pyramid

    cam = Camera.from_params(30.0, 30.0, 16.0, 16.0, 32, 32)
    rng = np.random.default_rng(11)
    us = rng.choice(32, size=64)
    vs = rng.choice(32, size=64)
    zs = rng.uniform(4.0, 8.0, size=64)
    pts = jnp.asarray(np.stack(
        [(us - 16.0) * zs / 30.0, (vs - 16.0) * zs / 30.0, zs], axis=1
    ).astype(np.float32))
    cols = jnp.asarray(rng.uniform(0, 255, size=(64, 3)).astype(np.float32))
    valid = jnp.ones((64,), bool)
    mesh = make_mesh((2, 4))
    Es = [np.eye(4), np.eye(4)]
    Es[1][2, 3] = 0.1
    cams = jnp.asarray(np.stack([cam.cam_proj(E) for E in Es]), jnp.float32)

    @jax.jit
    def loss_of_cams(cams):
        out = rasterize_diff_sharded_batch(
            pts, cols, cams, mesh, width=32, height=32, valid=valid,
        )

        def one(d, c):
            dpad, cpad = pad_to_pyramid(d, c, 3)
            return depth_prefilter(dpad, cpad, levels=3)["unet_input"]

        x = jax.vmap(one)(out.depth, out.rgb)
        # depth channel only: smooth in z (colors/masks are straight-through
        # piecewise-constant and would break FD at the quantization edges)
        return jnp.sum(jnp.where(x[..., 4] > -1.0, x[..., 4], 0.0) ** 2)

    g = jax.grad(loss_of_cams)(cams)
    eps = 3e-4
    # probe entries that perturb depths NON-uniformly: a uniform shift
    # (M[2,3]) leaves the normalized depth channel invariant
    checked = 0
    for (f, i, j) in [(0, 2, 0), (1, 2, 1)]:
        cp = np.asarray(cams, np.float64).copy()
        cp[f, i, j] += eps
        lp = float(loss_of_cams(jnp.asarray(cp, jnp.float32)))
        cp[f, i, j] -= 2 * eps
        lm = float(loss_of_cams(jnp.asarray(cp, jnp.float32)))
        fd = (lp - lm) / (2 * eps)
        got = float(g[f, i, j])
        assert got == pytest.approx(fd, rel=0.05, abs=5e-3), (f, i, j, got, fd)
        checked += 1
    assert checked == 2
