"""U-Net training with the rasterizer in the graph.

The reference ships no training code at all (SURVEY.md section 2) — only the
pretrained checkpoint and the ``loadCubemaps`` pair generator
(cloudreader.cpp:219-254) that aligns scanner photos with rendered
depth/projection from the same pose. This module supplies the missing
training loop, TPU-first:

- the raster + prefilter run in-graph per step (fresh packed inputs every
  step, no cached dataset of renders needed),
- frames shard over the ``"batch"`` mesh axis and the scene over
  ``"points"``; U-Net parameter gradients are mean-reduced over the global
  batch — under jit, XLA inserts the psum over ICI automatically because
  the loss is a mean over a batch-sharded activation against replicated
  parameters,
- BatchNorm runs in training mode with running statistics synchronized
  cross-batch via the loss-side psum of the stats update (flax mutable
  collections).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rtnr_tpu.models.unet import UNet
from rtnr_tpu.parallel.render import render_filtered_sharded


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: int = 0


def create_train_state(
    unet: UNet,
    variables: Dict,
    optimizer: Optional[optax.GradientTransformation] = None,
    learning_rate: float = 1e-4,
) -> Tuple[TrainState, optax.GradientTransformation]:
    tx = optimizer if optimizer is not None else optax.adam(learning_rate)
    params = variables["params"]
    return (
        TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", FrozenDict()),
            opt_state=tx.init(params),
        ),
        tx,
    )


def l1_loss(pred: jax.Array, target: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
    err = jnp.abs(pred - target)
    if mask is not None:
        return jnp.sum(err * mask[..., None]) / (jnp.sum(mask) * pred.shape[-1] + 1e-8)
    return jnp.mean(err)


def make_train_step(
    unet: UNet,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    depth_band: float = 0.02,
    levels: int = 4,
    filter_strength: float = 1.025,
    gradient_filter: float = 0.03,
    points_axis: str = "points",
    batch_axis: str = "batch",
    loss_fn: Callable = l1_loss,
) -> Callable:
    """Build the jitted sharded train step.

    step(state, points, colors, valid, cam_projs (F,4,4), targets
    (F,H,W,3) float in [0,1]) -> (state, metrics).
    """

    def step_fn(state: TrainState, points, colors, valid, cam_projs, targets):
        mid = render_filtered_sharded(
            points, colors, valid, cam_projs, mesh,
            width=width, height=height, depth_band=depth_band, levels=levels,
            filter_strength=filter_strength, gradient_filter=gradient_filter,
            points_axis=points_axis, batch_axis=batch_axis,
        )
        x = mid["unet_input"]  # (F, H', W', 5) — constant wrt params
        x = jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(batch_axis)))
        x = jax.lax.stop_gradient(x)

        def loss(params):
            y, mutated = unet.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            y = y.astype(jnp.float32)[:, :height, :width]
            return loss_fn(y, targets), mutated["batch_stats"]

        (loss_val, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        gnorm = optax.global_norm(grads)
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, {"loss": loss_val, "grad_norm": gnorm}

    return jax.jit(step_fn)


@struct.dataclass
class SceneTrainState:
    """Joint U-Net + scene fine-tune state (colors sharded over the points
    axis, poses replicated)."""

    params: Any
    batch_stats: Any
    colors: Any  # (N, 3) float32, 0..255 scale
    cam_projs: Any  # (F, 4, 4) float32
    opt_state: Any
    step: int = 0


def make_scene_train_step(
    unet: UNet,
    tx: optax.GradientTransformation,
    mesh: Mesh,
    *,
    width: int,
    height: int,
    depth_band: float = 0.02,
    levels: int = 4,
    filter_strength: float = 1.025,
    gradient_filter: float = 0.03,
    points_axis: str = "points",
    batch_axis: str = "batch",
    loss_fn: Callable = l1_loss,
) -> Callable:
    """Sharded scene-finetune step: gradients flow through the MULTI-CHIP
    differentiable raster (parallel/diff.py) into point colors and camera
    poses as well as U-Net parameters — the full BASELINE config-4 shape on
    a mesh. Color cotangents land on the owning point shard; pose cotangents
    psum over the points axis inside the raster's custom VJP; U-Net grads
    psum over the batch axis via the mean loss (reference analog: none —
    the reference is inference-only, project_cloud.cu:473).

    step(state, points, valid, targets (F,H,W,3) in [0,1]) ->
    (state, metrics).
    """
    from rtnr_tpu.ops.prefilter import depth_prefilter
    from rtnr_tpu.parallel.diff import rasterize_diff_sharded_batch
    from rtnr_tpu.pipeline import pad_to_pyramid

    def step_fn(state: SceneTrainState, points, valid, targets):
        def loss(leaves):
            params, colors, cams = leaves
            out = rasterize_diff_sharded_batch(
                points, colors, cams, mesh,
                width=width, height=height, valid=valid,
                depth_band=depth_band, points_axis=points_axis,
                batch_axis=batch_axis,
            )

            def one(d, c):
                dpad, cpad = pad_to_pyramid(d, c, levels)
                pf = depth_prefilter(
                    dpad, cpad, levels=levels,
                    filter_strength=filter_strength,
                    gradient_filter=gradient_filter,
                )
                return pf["unet_input"]

            x = jax.vmap(one)(out.depth, out.rgb)
            x = jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(batch_axis))
            )
            y, mutated = unet.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x,
                train=True,
                mutable=["batch_stats"],
            )
            y = y.astype(jnp.float32)[:, :height, :width]
            return loss_fn(y, targets), mutated["batch_stats"]

        leaves = (state.params, state.colors, state.cam_projs)
        (loss_val, new_stats), grads = jax.value_and_grad(loss, has_aux=True)(leaves)
        updates, new_opt = tx.update(grads, state.opt_state, leaves)
        new_params, new_colors, new_cams = optax.apply_updates(leaves, updates)
        new_state = SceneTrainState(
            params=new_params,
            batch_stats=new_stats,
            colors=new_colors,
            cam_projs=new_cams,
            opt_state=new_opt,
            step=state.step + 1,
        )
        metrics = {
            "loss": loss_val,
            "grad_norm": optax.global_norm(grads),
            "color_grad_norm": optax.global_norm(grads[1]),
            "pose_grad_norm": optax.global_norm(grads[2]),
        }
        return new_state, metrics

    return jax.jit(step_fn)
