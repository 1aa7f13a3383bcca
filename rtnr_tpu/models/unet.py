"""Flax U-Net refinement network.

Architecture parity with the reference PyTorch model (reference
model/model.py:5-69): ``DoubleConv`` = 2x (3x3 conv, no bias -> BatchNorm ->
ReLU); encoder over features [64,128,256,512] with 2x2 max-pool; bottleneck
to 1024; decoder of 2x2 stride-2 transposed conv + skip concat (skip first,
then upsampled — model.py:66) + DoubleConv; final 1x1 conv to 3 channels.
Input is the 5-channel packed tensor (RGB, mask, normalized depth).

TPU-native stance: NHWC layout (XLA's preferred conv layout on TPU), bf16
compute with f32 parameters/statistics, and the network jits together with
the rasterizer + prefilter into a single XLA program — there is no
TorchScript/TensorRT-style AOT export step (reference model/export_pt.py,
export_ts.py); XLA's persistent compilation cache plays that role.

If decoder/skip spatial dims disagree (odd input sizes), the upsampled
tensor is bilinearly resized to the skip's shape, matching the reference's
``TF.resize`` fallback (model.py:63-64). With pyramid-padded inputs
(H, W divisible by 16) this path never triggers.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BatchNorm -> ReLU) x 2 (reference model.py:5-19).

    With ``fold_bn=True`` the BN is assumed pre-folded into the conv
    (rtnr_tpu.models.fold_bn): conv carries a bias and no BN runs —
    the fast inference configuration."""

    features: int
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        for i in range(2):
            x = nn.Conv(
                self.features,
                kernel_size=(3, 3),
                strides=(1, 1),
                padding=((1, 1), (1, 1)),
                use_bias=self.fold_bn,
                dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if not self.fold_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,  # torch BatchNorm2d momentum=0.1 convention
                    epsilon=1e-5,
                    dtype=self.dtype,
                    name=f"bn{i}",
                )(x)
            x = nn.relu(x)
        return x


class UNet(nn.Module):
    """5-channel -> 3-channel refinement U-Net (reference model.py:21-69)."""

    features: Sequence[int] = (64, 128, 256, 512)
    out_channels: int = 3
    dtype: Any = jnp.float32
    fold_bn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        skips = []
        for i, f in enumerate(self.features):
            x = DoubleConv(f, dtype=self.dtype, fold_bn=self.fold_bn, name=f"down{i}")(x, train)
            skips.append(x)
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))

        x = DoubleConv(self.features[-1] * 2, dtype=self.dtype, fold_bn=self.fold_bn, name="bottleneck")(x, train)

        for i, f in enumerate(reversed(self.features)):
            x = nn.ConvTranspose(
                f,
                kernel_size=(2, 2),
                strides=(2, 2),
                padding="VALID",
                dtype=self.dtype,
                name=f"up{i}",
            )(x)
            skip = skips[-(i + 1)]
            if x.shape[1:3] != skip.shape[1:3]:
                x = jax.image.resize(
                    x, (x.shape[0], skip.shape[1], skip.shape[2], x.shape[3]), "bilinear"
                )
            x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
            x = DoubleConv(f, dtype=self.dtype, fold_bn=self.fold_bn, name=f"updc{i}")(x, train)

        return nn.Conv(
            self.out_channels, kernel_size=(1, 1), dtype=self.dtype, name="final_conv"
        )(x)


def init_unet(
    rng: jax.Array,
    height: int,
    width: int,
    in_channels: int = 5,
    features: Sequence[int] = (64, 128, 256, 512),
    dtype: Any = jnp.float32,
) -> Tuple[UNet, dict]:
    """Initialize a UNet + variables for a given input shape."""
    model = UNet(features=tuple(features), dtype=dtype)
    variables = model.init(rng, jnp.zeros((1, height, width, in_channels), jnp.float32))
    return model, variables
