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

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class Conv3x3Im2col(nn.Conv):
    """3x3 same-padding conv lowered as explicit im2col + one matmul.

    XLA's TPU conv lowering is pathological for tiny input-channel counts
    (the 5-channel packed input conv measured ~10x slower than its memory
    bound in isolation — scripts/profile_unet_layers.py): the contraction
    K = 9*C_in is small and the emitter picks a bad layout. Materializing
    the 9 shifted taps (cheap: 9 slices of an already-small tensor) and
    contracting K = 9*C_in on the MXU in one dot is the fast path whenever
    9*C_in fits a couple of MXU tiles. Identical arithmetic to the conv
    (same contraction, f32 accumulation), so parity is exact.
    """

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # This lowering hardcodes 3x3 / stride-1 / same-padding; inherited
        # nn.Conv config fields other than these would be silently ignored.
        if tuple(self.kernel_size) != (3, 3):
            raise ValueError(f"Conv3x3Im2col requires kernel_size (3,3), got {self.kernel_size}")
        if tuple(self.strides or (1, 1)) != (1, 1):
            raise ValueError(f"Conv3x3Im2col requires strides (1,1), got {self.strides}")
        if self.padding != ((1, 1), (1, 1)):
            raise ValueError(f"Conv3x3Im2col requires padding ((1,1),(1,1)), got {self.padding}")
        if self.feature_group_count != 1:
            raise ValueError("Conv3x3Im2col does not support grouped convs")
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (3, 3, c_in, self.features),
            self.param_dtype,
        )
        bias = (
            self.param("bias", self.bias_init, (self.features,), self.param_dtype)
            if self.use_bias
            else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        n, h, w, _ = x.shape
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        taps = [
            xp[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)
        ]
        patches = jnp.concatenate(taps, axis=-1)  # (N, H, W, 9*C)
        y = jax.lax.dot_general(
            patches.reshape(n * h * w, 9 * c_in),
            kernel.reshape(9 * c_in, self.features),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        y = y.reshape(n, h, w, self.features)
        if bias is not None:
            y = y + bias
        return y


class ConvTranspose2x2MatMul(nn.Module):
    """2x2 stride-2 transposed conv lowered as one matmul + depth-to-space.

    Arithmetic- and parameter-compatible with
    ``nn.ConvTranspose(features, (2,2), (2,2), "VALID")``: kernel shape
    (2, 2, C_in, C_out), bias (C_out,), and
    ``y[2i+di, 2j+dj] = sum_c x[i,j,c] * kernel[di,dj,c,o]`` — with stride
    == kernel size every output pixel gets exactly one tap, so the op IS a
    per-pixel matmul C_in -> 4*C_out followed by a pixel-shuffle. The matmul
    form contracts to a (C_in, 4*C_out) MXU dot (full 128-lane output tiles)
    instead of XLA's transposed-conv lowering.
    """

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (2, 2, c_in, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        n, h, w, _ = x.shape
        # flax ConvTranspose (lax.conv_transpose, transpose_kernel=False)
        # applies the SPATIALLY FLIPPED kernel; with stride == kernel size
        # output subpixel (di, dj) therefore reads kernel[1-di, 1-dj]
        k = kernel[::-1, ::-1].transpose(2, 0, 1, 3).reshape(c_in, 4 * self.features)
        y = jax.lax.dot_general(
            x.reshape(n * h * w, c_in), k,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        y = y.reshape(n, h, w, 2, 2, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * w, self.features)
        return y + bias


class Conv3x3PadIn(nn.Module):
    """3x3 conv whose tiny logical input-channel count is zero-padded to a
    hardware-friendly physical count (default 8) at call time.

    The parameter keeps the LOGICAL (3, 3, c_in, F) shape (checkpoint
    compatible); input and kernel are zero-extended together, so the result
    is bit-identical to the direct conv while XLA's conv emitter sees a
    power-of-two channel count."""

    features: int
    phys_in: int = 8
    dtype: Any = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, c_in, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        pad = self.phys_in - c_in
        if pad > 0:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
            kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad), (0, 0)))
        y = jax.lax.conv_general_dilated(
            x, kernel, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if bias is not None:
            y = y + bias
        return y


class ConvSplitInput(nn.Module):
    """3x3 conv over the *virtual* concat of two inputs, without the concat.

    ``conv(concat([a, b], -1), kernel)`` == ``conv(a, kernel[:, :, :Ca]) +
    conv(b, kernel[:, :, Ca:])`` — same contraction split over the channel
    dim. The parameter is the SAME single (3, 3, Ca+Cb, F) kernel (plus
    optional bias), so checkpoints are interchangeable with the concat
    form; what changes is that XLA never materializes (and never
    layout-pads) the concatenated skip+upsample tensor.
    """

    features: int
    dtype: Any = jnp.float32
    use_bias: bool = False

    @nn.compact
    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        ca, cb = a.shape[-1], b.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, ca + cb, self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        a, b, kernel, bias = nn.dtypes.promote_dtype(a, b, kernel, bias, dtype=self.dtype)

        def conv(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        y = conv(a, kernel[:, :, :ca]) + conv(b, kernel[:, :, ca:])
        if bias is not None:
            y = y + bias
        return y


def phase_input_ok(unet, h: int, w: int, *, force: bool = False) -> bool:
    """Whether ``unet`` will take the packed phase-planar path for an
    (h, w) input — shared by UNet.__call__ and pipeline callers that
    pre-pack the input (ops/prefilter_phase.py)."""
    n_lv = len(unet.features)
    P0 = 1 << n_lv
    return bool(
        unet.conv_impl == "pallas"
        and unet.fold_bn
        and unet.dtype == jnp.bfloat16
        and h % (4 << n_lv) == 0
        and w % P0 == 0
        and w // P0 <= 128
        and unet.features[0] % 8 == 0
        and (
            force
            or (jax.default_backend() == "tpu" and h * w >= (1 << 20))
        )
    )


class ConvParams(nn.Module):
    """Bare parameter holder matching ``nn.Conv``'s tree ("kernel"/"bias")
    for paths that hand the arrays to a Pallas kernel directly — checkpoint
    and init compatible with the XLA module it stands in for."""

    kshape: Tuple[int, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self) -> Tuple[jax.Array, Optional[jax.Array]]:
        k = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kshape, jnp.float32
        )
        b = (
            self.param("bias", nn.initializers.zeros_init(),
                       (self.kshape[-1],), jnp.float32)
            if self.use_bias
            else None
        )
        return k, b


class DoubleConv(nn.Module):
    """(Conv3x3 no-bias -> BatchNorm -> ReLU) x 2 (reference model.py:5-19).

    With ``fold_bn=True`` the BN is assumed pre-folded into the conv
    (rtnr_tpu.models.fold_bn): conv carries a bias and no BN runs —
    the fast inference configuration.

    When ``x2`` is passed, the first conv runs over the virtual concat
    [x, x2] via ``ConvSplitInput`` (identical parameters/result, no
    materialized concat)."""

    features: int
    dtype: Any = jnp.float32
    fold_bn: bool = False
    # lowering for tiny input-channel counts (the 5-channel packed input):
    # "im2col" (explicit patches + one dot), "pad8" (zero-extend channels
    # to 8, native conv), "native" (XLA conv as-is)
    tiny_cin_impl: str = "im2col"
    # "pallas" (used via UNet's phase path only): convs run as packed
    # phase-planar Pallas kernels through the ``split`` call mode; the
    # plain NHWC call always uses XLA convs
    conv_impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        x2: Optional[jax.Array] = None,
        split: Optional[dict] = None,
    ):
        if split is not None:
            # packed phase-planar fused pair (ops/conv_phase.py): x (and
            # x2) are packed P-phase arrays; returns (out,) or
            # (out, pooled). Params keep nn.Conv's tree (conv0/conv1).
            # With split["up"] = (kernel, bias), x2 is the HALF-resolution
            # deep activation and the decoder's ConvTranspose fuses into
            # conv0 (ops/conv_phase.py fused-up path).
            # split["quant"] = (q0, q1) routes either conv through the int8
            # MXU path with per-lane DYNAMIC activations; split["q0"]/"q1"
            # carry full static-int8 configs (quant/in_scales/out_scale)
            # for the calibrated pipeline; split["calibrate"] records each
            # conv's activation max via flax sow for that calibration.
            from rtnr_tpu.ops.conv_phase import conv3x3_phase

            assert self.fold_bn and not train
            h, w, P = split["h"], split["w"], split["P"]
            c0 = split["c_in"]  # true (pre-padding) input channels
            c2 = split.get("c_in2", 0) if x2 is not None else 0
            cin = c0 + c2
            interp = split.get("interpret", False)
            up = split.get("up")
            q0, q1 = split.get("quant", (False, False))
            kw0 = split.get("q0") or dict(quant=q0 and up is None)
            kw1 = split.get("q1") or dict(quant=q1)
            cal = split.get("calibrate", False)
            f = self.features
            k0, b0 = ConvParams((3, 3, cin, f), name="conv0")()
            arrs = [x] + ([x2] if x2 is not None else [])
            (y,) = conv3x3_phase(
                arrs, k0, b0,
                up_kernel=None if up is None else up[0],
                up_bias=None if up is None else up[1],
                h=h, w=w, P=P, relu=True, interpret=interp, **kw0,
            )
            if cal:
                self.sow("intermediates", "c0",
                         jnp.max(jnp.abs(y.astype(jnp.float32))))
            k1, b1 = ConvParams((3, 3, f, f), name="conv1")()
            head = split.get("head")
            pool = split.get("pool", False)
            outs = conv3x3_phase(
                [y], k1, b1,
                head_kernel=None if head is None else head[0],
                head_bias=None if head is None else head[1],
                h=h, w=w, P=P, relu=True, pool=pool, interpret=interp, **kw1,
            )
            if cal and head is None:
                self.sow("intermediates", "c1",
                         jnp.max(jnp.abs(outs[0].astype(jnp.float32))))
            return outs
        for i in range(2):
            if i == 0 and x2 is not None:
                x = ConvSplitInput(
                    self.features, dtype=self.dtype, use_bias=self.fold_bn, name="conv0"
                )(x, x2)
            elif x.shape[-1] * 9 <= 128 and self.tiny_cin_impl == "im2col":
                x = Conv3x3Im2col(
                    self.features,
                    kernel_size=(3, 3),
                    strides=(1, 1),
                    padding=((1, 1), (1, 1)),
                    use_bias=self.fold_bn,
                    dtype=self.dtype,
                    name=f"conv{i}",
                )(x)
            elif x.shape[-1] * 9 <= 128 and self.tiny_cin_impl == "pad8":
                x = Conv3x3PadIn(
                    self.features,
                    use_bias=self.fold_bn,
                    dtype=self.dtype,
                    name=f"conv{i}",
                )(x)
            else:
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
    # tiny-Cin input-conv lowering: "im2col" | "pad8" | "native"
    # (measured on v5e via scripts/bench_parts.py)
    tiny_cin_impl: str = "im2col"
    # "reduce_window": nn.max_pool; "slice_max": max of the four stride-2
    # slices — same values, fuses without the relayout copies XLA inserts
    # around reduce_window at large shapes (see /tmp hlo_stats analysis)
    pool_impl: str = "reduce_window"
    # "concat": materialize [skip, up] then DoubleConv; "split": virtual
    # concat via ConvSplitInput (same params, no concat/pad relayouts).
    # Measured on v5e at 1088x1920 (scripts/bench_parts.py): split 39.8 ms
    # vs concat 42.0 ms per apply — split is the default. (The other
    # lowering flags measured SLOWER and keep their XLA-native defaults:
    # im2col-off 49.1 ms, slice_max pool 94.7 ms, matmul up_impl worse in
    # isolation; kept as measured foils.)
    skip_concat: str = "split"
    # "pallas": the WHOLE net runs as packed phase-planar Pallas kernels
    # (ops/conv_phase.py): every conv pair (+fused 2x2 pool), every
    # ConvTranspose, and the final 1x1 conv, at every pyramid level —
    # NHWC only at the 5ch input / 3ch output (measured on v5e,
    # PROFILE_r02.md). "xla": native convs everywhere (training, CPU,
    # multi-batch, odd shapes).
    conv_impl: str = "pallas"
    # "convt": XLA's native transposed-conv lowering; "matmul": exact
    # matmul+depth-to-space rewrite (ConvTranspose2x2MatMul). Measured on
    # v5e (scripts/profile_layers2.py): convT is bandwidth-bound and FASTER
    # than the matmul form (whose pixel-shuffle transpose costs a relayout
    # pass), so convt stays the default; matmul is kept as a measured foil.
    up_impl: str = "convt"
    # int8 phase-path inference (v5e MXU int8 = 2x bf16 peak): every conv
    # pair runs quantized EXCEPT the 5-channel input conv (down0.conv0) and
    # the fused 1x1 head, which stay bf16. Approximate — parity budget
    # pinned by tests/test_unet_split.py; the reference's own shipped
    # inference is precision-degraded fp16 TensorRT (model/export_ts.py:16).
    # Only affects the packed phase-planar path; XLA path ignores it.
    quant_int8: bool = False
    # feature-width threshold above which a conv pair quantizes: the deep
    # levels' large-K/small-N matmuls win 1.4-1.65x int8 on v5e while the
    # full/half-res levels are epilogue/DMA-bound and only pay quant
    # overhead (scripts/profile_conv_levels.py). Tests lower it to cover
    # the int8 path at tiny widths.
    quant_min_f: int = 256

    @nn.compact
    def __call__(
        self,
        x: Optional[jax.Array],
        train: bool = False,
        x_phase: Optional[Tuple[jax.Array, int, int, int]] = None,
        act_scales: Optional[dict] = None,
        calibrate: bool = False,
    ) -> jax.Array:
        import os

        if x_phase is not None:
            # pre-packed phase-planar input ((H+2)*8, P0*128) bf16 from
            # ops/prefilter_phase.py — skips the NHWC->phase conversion
            xp, h0, w0, c0 = x_phase
            n_lv = len(self.features)
            force = os.environ.get("RTNR_SPLIT_FORCE") == "1"
            interp = force and jax.default_backend() != "tpu"
            assert phase_input_ok(self, h0, w0, force=force)
            return self._phase_forward(None, 1 << n_lv, interp,
                                       packed=(xp, h0, w0, c0),
                                       act_scales=act_scales,
                                       calibrate=calibrate)

        x = x.astype(self.dtype)
        # Packed phase-planar U-Net (ops/conv_phase.py): EVERY level's conv
        # pair (+fused pool), every ConvTranspose, and the final 1x1 conv
        # run as Pallas kernels in the P-phase polyphase layout (full-res
        # P = 2^levels, halving per level) — NHWC touches only the
        # 5-channel input and 3-channel output, eliminating XLA's layout
        # glue throughout. RTNR_SPLIT_FORCE=1 lets CPU tests exercise the
        # path in interpret mode at small shapes.
        force = os.environ.get("RTNR_SPLIT_FORCE") == "1"
        n_lv = len(self.features)
        P0 = 1 << n_lv
        use_phase = (
            not train
            and phase_input_ok(self, x.shape[1], x.shape[2], force=force)
        )
        interp = force and jax.default_backend() != "tpu"
        if use_phase:
            # batched inference stays on the fast phase path: the Pallas
            # kernels are single-image (rows are (H+2)*C), so the phase
            # forward unrolls one frame at a time over SHARED submodules —
            # per-frame cost equals the single-image fast path, which beats
            # the XLA-conv fallback ~1.7x at deployment shapes
            # (PROFILE_r02.md)
            return self._phase_forward(x, P0, interp,
                                       act_scales=act_scales,
                                       calibrate=calibrate)

        skips = []
        for i, f in enumerate(self.features):
            x = DoubleConv(f, dtype=self.dtype, fold_bn=self.fold_bn,
                           tiny_cin_impl=self.tiny_cin_impl,
                           conv_impl=self.conv_impl, name=f"down{i}")(x, train)
            skips.append(x)
            if self.pool_impl == "slice_max":
                x = jnp.maximum(
                    jnp.maximum(x[:, ::2, ::2], x[:, 1::2, ::2]),
                    jnp.maximum(x[:, ::2, 1::2], x[:, 1::2, 1::2]),
                )
            else:
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))

        x = DoubleConv(self.features[-1] * 2, dtype=self.dtype, fold_bn=self.fold_bn, name="bottleneck")(x, train)

        for i, f in enumerate(reversed(self.features)):
            if self.up_impl == "matmul":
                x = ConvTranspose2x2MatMul(f, dtype=self.dtype, name=f"up{i}")(x)
            else:
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
            if self.skip_concat == "split":
                x = DoubleConv(f, dtype=self.dtype, fold_bn=self.fold_bn,
                               conv_impl=self.conv_impl,
                               name=f"updc{i}")(skip, train, x2=x.astype(skip.dtype))
            else:
                x = jnp.concatenate([skip, x.astype(skip.dtype)], axis=-1)
                x = DoubleConv(f, dtype=self.dtype, fold_bn=self.fold_bn,
                               conv_impl=self.conv_impl, name=f"updc{i}")(x, train)

        return nn.Conv(
            self.out_channels, kernel_size=(1, 1), dtype=self.dtype, name="final_conv"
        )(x)

    def _phase_forward(
        self,
        x: Optional[jax.Array],
        P0: int,
        interp: bool,
        packed: Optional[Tuple[jax.Array, int, int, int]] = None,
        act_scales: Optional[dict] = None,
        calibrate: bool = False,
    ) -> jax.Array:
        """Whole-net packed phase-planar forward (inference, folded BN).
        Parameter tree is identical to the XLA path's (ConvParams mirrors
        nn.Conv/nn.ConvTranspose), so checkpoints interchange.

        Accepts a batch: submodules are constructed ONCE and applied per
        frame (flax registers a submodule name once; repeated calls share
        parameters), so batched inference stays on the fast phase path."""
        from rtnr_tpu.ops.conv_phase import (
            convt2x2_phase, from_phase, to_phase,
        )

        if packed is not None:
            frames = [packed]
        else:
            h0, w0, c0 = x.shape[1], x.shape[2], x.shape[3]
            frames = [
                (to_phase(x[i : i + 1], P0), h0, w0, c0)
                for i in range(x.shape[0])
            ]

        # ---- construct every submodule / parameter once ----
        downs = [
            DoubleConv(f, dtype=self.dtype, fold_bn=self.fold_bn,
                       conv_impl=self.conv_impl, name=f"down{i}")
            for i, f in enumerate(self.features)
        ]
        bottleneck = DoubleConv(
            self.features[-1] * 2, dtype=self.dtype, fold_bn=self.fold_bn,
            conv_impl=self.conv_impl, name="bottleneck",
        )
        up_params = []
        updcs = []
        cc_up = self.features[-1] * 2
        for i, f in enumerate(reversed(self.features)):
            up_params.append(ConvParams((2, 2, cc_up, f), name=f"up{i}")())
            updcs.append(
                DoubleConv(f, dtype=self.dtype, fold_bn=self.fold_bn,
                           conv_impl=self.conv_impl, name=f"updc{i}")
            )
            cc_up = f
        kf, bf = ConvParams(
            (1, 1, self.features[0], self.out_channels), name="final_conv"
        )()
        final_head = (kf[0, 0], bf)

        import os as _os

        from rtnr_tpu.ops.conv_phase import fuse_up_ok

        # fused ConvTranspose+conv0 measured SLOWER on v5e than the
        # standalone convT kernel (full-res level: 4.89/4.95 ms fused at
        # TR=2/4 vs 4.74 unfused; whole net 23.10 vs 22.85 ms) — the
        # separate kernel's HBM round trip overlaps with compute, while the
        # fused form serializes the convT work into the conv's row loop.
        # Kept as a measured foil: RTNR_FUSE_UP=1 enables it.
        no_fuse = _os.environ.get("RTNR_FUSE_UP") != "1"

        # int8 modes (only the packed phase path):
        # - STATIC (act_scales given): int8 activations in HBM with
        #   per-layer calibrated scales — every conv pair and ConvTranspose
        #   quantizes except the 5ch input conv's input side and the final
        #   head; halves activation traffic and skips in-kernel act quant.
        # - DYNAMIC (no act_scales): bf16 activations, in-kernel per-lane
        #   quant, applied only above quant_min_f where it measures a win
        #   (deep large-K/small-N matmuls 1.4-1.65x on v5e; full/half-res
        #   levels are epilogue/DMA-bound — scripts/profile_conv_levels.py).
        # ``calibrate`` records every activation max via sow("intermediates")
        # for calibrate_act_scales.
        def qlv(f):
            return self.quant_int8 and f >= self.quant_min_f

        q = self.quant_int8
        static = q and act_scales is not None

        def one_frame(xp, h0, w0, c0):
            P, hs, ws, cc = P0, h0, w0, c0
            n_last = len(self.features) - 1

            def sc(key):
                return act_scales[key]

            def st(in_keys, out_key):
                return dict(
                    quant="static",
                    in_scales=tuple(sc(k) for k in in_keys),
                    out_scale=None if out_key is None else sc(out_key),
                )

            skips = []
            for i, f in enumerate(self.features):
                if static:
                    qcfg = dict(
                        q0=(dict(quant="", out_scale=sc(f"down{i}/c0"))
                            if i == 0 else
                            st((f"down{i - 1}/c1",), f"down{i}/c0")),
                        q1=st((f"down{i}/c0",), f"down{i}/c1"),
                    )
                else:
                    qf = qlv(f)
                    qcfg = dict(quant=(qf and i > 0, qf))
                skip, pooled = downs[i](
                    xp, False, split=dict(h=hs, w=ws, P=P, c_in=cc,
                                          pool=True, interpret=interp,
                                          calibrate=calibrate, **qcfg))
                skips.append(skip)
                xp, P, hs, ws, cc = pooled, P // 2, hs // 2, ws // 2, f

            if static:
                qcfg = dict(
                    q0=st((f"down{n_last}/c1",), "bottleneck/c0"),
                    q1=st(("bottleneck/c0",), "bottleneck/c1"),
                )
            else:
                qb = qlv(self.features[-1] * 2)
                qcfg = dict(quant=(qb, qb))
            (xp,) = bottleneck(
                xp, False, split=dict(h=hs, w=ws, P=P, c_in=cc,
                                      interpret=interp, calibrate=calibrate,
                                      **qcfg))
            cc = self.features[-1] * 2

            for i, f in enumerate(reversed(self.features)):
                kup, bup = up_params[i]
                hs, ws = hs * 2, ws * 2
                last = i == len(self.features) - 1
                head = final_head if last else None
                # fuse the ConvTranspose into the following conv pair's
                # first conv when it fits VMEM in one F block (saves one
                # full-res activation round trip through HBM); else run it
                # standalone
                qf = qlv(f)
                skip_key = f"down{n_last - i}/c1"
                prev_key = ("bottleneck/c1" if i == 0
                            else f"updc{i - 1}/c1")
                # calibration must mirror the STATIC topology (which never
                # fuses), else the fused branch would skip sowing u{i}t and
                # the static forward would KeyError on its scale
                if (not static and not calibrate and not no_fuse
                        and fuse_up_ok(hs, 2 * P, f, f, cc, f)):
                    P *= 2
                    (xp,) = updcs[i](
                        skips[-(i + 1)], False, x2=xp,
                        split=dict(h=hs, w=ws, P=P, c_in=f, c_in2=f,
                                   head=head, up=(kup, bup),
                                   interpret=interp, calibrate=calibrate,
                                   quant=(False, qf)))
                else:
                    tr_t = 4 if (hs // 2) % 4 == 0 and cc < 512 else 2
                    tkw = {}
                    if static:
                        tkw = dict(quant="static",
                                   in_scale=sc(prev_key),
                                   out_scale=sc(f"u{i}t"))
                    xp = convt2x2_phase(
                        xp, kup, bup, h=hs, w=ws, P=P, rows_per_step=tr_t,
                        interpret=interp, **tkw,
                    )
                    if calibrate:
                        self.sow("intermediates", f"u{i}t",
                                 jnp.max(jnp.abs(xp.astype(jnp.float32))))
                    P *= 2
                    if static:
                        qcfg = dict(
                            q0=st((skip_key, f"u{i}t"), f"updc{i}/c0"),
                            q1=st((f"updc{i}/c0",),
                                  None if last else f"updc{i}/c1"),
                        )
                    else:
                        qcfg = dict(quant=(qf, qf))
                    (xp,) = updcs[i](
                        skips[-(i + 1)], False, x2=xp,
                        split=dict(h=hs, w=ws, P=P, c_in=f, c_in2=f,
                                   head=head, interpret=interp,
                                   calibrate=calibrate, **qcfg))
                cc = f
            return from_phase(xp, h0, w0, 8, P)[..., : self.out_channels]

        outs = [one_frame(*fr) for fr in frames]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def calibrate_act_scales(
    unet: UNet,
    variables: dict,
    x: Optional[jax.Array] = None,
    x_phase: Optional[Tuple[jax.Array, int, int, int]] = None,
) -> dict:
    """One exact (bf16) phase-path forward on a representative input,
    recording every intermediate activation's max -> per-layer symmetric
    int8 scales for the static quantized pipeline (UNet.quant_int8 +
    act_scales). Run with a bf16-configured ``unet`` (same features);
    scales transfer to the quantized net. Outliers beyond the calibration
    input's range saturate at the int8 clip — the standard trade the
    reference's own fp16 TensorRT export makes (model/export_ts.py:16)."""
    from flax import traverse_util

    bf16 = unet.clone(quant_int8=False) if unet.quant_int8 else unet
    _, mut = bf16.apply(
        variables, x, x_phase=x_phase, calibrate=True,
        mutable=["intermediates"],
    )
    flat = traverse_util.flatten_dict(mut["intermediates"])
    scales = {}
    for path, v in flat.items():
        vals = v if isinstance(v, tuple) else (v,)
        m = vals[0]
        for extra in vals[1:]:
            m = jnp.maximum(m, extra)
        scales["/".join(path)] = (
            jnp.maximum(m, jnp.float32(1e-8)) * jnp.float32(1.0 / 127.0)
        )
    return scales


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
