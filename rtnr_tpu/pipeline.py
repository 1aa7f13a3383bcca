"""End-to-end render pipeline: raster -> prefilter -> U-Net, one XLA program.

The reference exposes three C++ entry points on ``ProjectCloud``
(computeRGBD / computeFilteredRGBD / computeFull, reference
project_cloud.h:11-18) with hand-managed device buffers, per-frame
cudaMalloc, and cudaDeviceSynchronize between kernels
(project_cloud.cu:314-329, 331-392). Here the three stages are pure jitted
functions over scene arrays; XLA owns all buffers and scheduling, and the
U-Net runs in-graph (no TorchScript/TensorRT sidecar).

``Renderer`` is the convenience wrapper mirroring the reference's object
API: it pins the scene to device once (the ctor upload of
project_cloud.cu:200-206) and caches compiled executables per resolution
(the reference reallocates buffers on resolution change,
project_cloud.cu:275-298 — here it's just a new jit specialization).
"""

from __future__ import annotations

import dataclasses
import functools
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtnr_tpu.camera import Camera
from rtnr_tpu.config import DEPTH_EMPTY, RenderConfig
from rtnr_tpu.models.unet import UNet
from rtnr_tpu.ops.prefilter import depth_prefilter
from rtnr_tpu.ops.raster import rasterize
from rtnr_tpu.scene import Scene


def pyramid_pad_shape(height: int, width: int, levels: int) -> Tuple[int, int]:
    """Smallest (H', W') >= (H, W) divisible by 2**levels.

    RTNR_PAD_TO_PHASE=1 additionally rounds H' up to the phase U-Net's row
    constraint (4 * 2**levels, models/unet.py:phase_input_ok), extending
    the int8/phase fast path to heights like 1440 (pads 1440 -> 1472 with
    empty rows, ~2x faster U-Net at that shape). Opt-in because the extra
    empty rows change the prefilter's BOTTOM-EDGE behavior within the last
    2**levels image rows (coarse Laplacian/compare neighborhoods see empty
    pad rows instead of the image boundary) — everywhere else the output
    is unchanged, but those rows are no longer bit-parity with the
    reference's exact-height pyramid."""
    m = 1 << levels
    ph = -(-height // m) * m
    if os.environ.get("RTNR_PAD_TO_PHASE") == "1":
        mh = 4 << levels
        ph = -(-height // mh) * mh
    return (ph, -(-width // m) * m)


def pad_to_pyramid(
    depth: jax.Array, rgb: jax.Array, levels: int
) -> Tuple[jax.Array, jax.Array]:
    """Pad depth (FLT_MAX = empty) and rgb (black) so H, W divide 2**levels.

    The reference's prefilter silently truncates non-divisible resolutions
    (see ops/prefilter.py docstring); we pad with empty pixels instead —
    padded pixels are always rejected by the filter, and outputs are cropped
    back by the caller.
    """
    h, w = depth.shape
    ph, pw = pyramid_pad_shape(h, w, levels)
    if (ph, pw) == (h, w):
        return depth, rgb
    depth = jnp.pad(depth, ((0, ph - h), (0, pw - w)), constant_values=DEPTH_EMPTY)
    rgb = jnp.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)))
    return depth, rgb


@functools.partial(jax.jit, static_argnames=("width", "height", "depth_band"))
def render_rgbd(
    points: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    depth_band: float = 0.02,
) -> Dict[str, jax.Array]:
    """Stage 1 — raw projection (reference computeRGBD, project_cloud.cu:268)."""
    rgb, depth = rasterize(
        points, colors, cam_proj, width=width, height=height, valid=valid, depth_band=depth_band
    )
    return {"rgb": rgb, "depth": depth}


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "depth_band", "levels"),
)
def render_filtered(
    points: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    cam_proj: jax.Array,
    *,
    width: int,
    height: int,
    depth_band: float = 0.02,
    levels: int = 4,
    filter_strength: float = 1.025,
    gradient_filter: float = 0.03,
) -> Dict[str, jax.Array]:
    """Stage 2 — projection + depth prefilter (reference computeFilteredRGBD,
    project_cloud.cu:394-434). Returns the reference's post-filter buffers:
    rgb zeroed and depth -1 at rejected pixels, plus the packed U-Net input."""
    rgb, depth = rasterize(
        points, colors, cam_proj, width=width, height=height, valid=valid, depth_band=depth_band
    )
    dpad, cpad = pad_to_pyramid(depth, rgb, levels)
    out = depth_prefilter(
        dpad, cpad, levels=levels, filter_strength=filter_strength,
        gradient_filter=gradient_filter,
    )
    crop = lambda x: x[:height, :width]
    return {
        "rgb": crop(out["filtered_rgb"]),
        "depth": crop(out["filtered_depth"]),
        "raw_rgb": rgb,
        "raw_depth": depth,
        "mask": crop(out["mask"]),
        "unet_input": out["unet_input"],  # padded (H', W', 5) — U-Net runs padded
        "depth_min": out["depth_min"],
        "depth_max": out["depth_max"],
    }


def render_full(
    points: jax.Array,
    colors: jax.Array,
    valid: jax.Array,
    cam_proj: jax.Array,
    unet: UNet,
    unet_variables: Any,
    *,
    width: int,
    height: int,
    depth_band: float = 0.02,
    levels: int = 4,
    filter_strength: float = 1.025,
    gradient_filter: float = 0.03,
    act_scales: Any = None,
) -> Dict[str, jax.Array]:
    """Stage 3 — full neural render (reference computeFull,
    project_cloud.cu:437-493): raster + prefilter + U-Net, one fused program.

    Returns float RGB in [~0, 1] (``rgb_f``) and the 8-bit frame scaled by
    255 with saturation (``rgb``), matching the reference's
    ``convertTo(CV_8UC3, 255.0)`` (project_cloud.cu:480).
    """
    import os

    from rtnr_tpu.models.unet import phase_input_ok

    ph, pw = pyramid_pad_shape(height, width, levels)
    force = os.environ.get("RTNR_SPLIT_FORCE") == "1"
    # the packed layout's phase count (2^levels) must equal the U-Net's
    # (2^len(features)) for the zero-conversion handoff
    if levels == len(unet.features) and phase_input_ok(unet, ph, pw, force=force):
        # fused phase path: the prefilter runs in the polyphase layout and
        # its packed 5-channel output feeds the U-Net with no conversion
        from rtnr_tpu.ops.prefilter_phase import depth_prefilter_phase
        from rtnr_tpu.ops.raster import rasterize_packed, unpack_rgb8

        packed, depth = rasterize_packed(
            points, colors, cam_proj, width=width, height=height,
            valid=valid, depth_band=depth_band,
        )
        ph_, pw_ = pyramid_pad_shape(height, width, levels)
        dpad = depth
        ppad = packed
        if (ph_, pw_) != (height, width):
            dpad = jnp.pad(depth, ((0, ph_ - height), (0, pw_ - width)),
                           constant_values=DEPTH_EMPTY)
            ppad = jnp.pad(packed, ((0, ph_ - height), (0, pw_ - width)))
        pf = depth_prefilter_phase(
            dpad, ppad, P=1 << levels, levels=levels,
            filter_strength=filter_strength, gradient_filter=gradient_filter,
        )
        crop = lambda a: a[:height, :width]
        mid = {
            "depth": crop(pf["filtered_depth"]),
            "raw_rgb": unpack_rgb8(packed),
            "raw_depth": depth,
            "mask": crop(pf["mask"]),
        }
        y = unet.apply(
            unet_variables, None,
            x_phase=(pf["unet_input_phase"], ph, pw, 5),
            act_scales=act_scales,
        )[0].astype(jnp.float32)
    else:
        mid = render_filtered(
            points, colors, valid, cam_proj, width=width, height=height,
            depth_band=depth_band, levels=levels,
            filter_strength=filter_strength, gradient_filter=gradient_filter,
        )
        x = mid["unet_input"][None]  # (1, H', W', 5)
        y = unet.apply(unet_variables, x)[0].astype(jnp.float32)  # (H', W', 3)
    y = y[:height, :width]
    rgb8 = jnp.clip(jnp.rint(y * 255.0), 0, 255).astype(jnp.uint8)
    return {
        "rgb": rgb8,
        "rgb_f": y,
        "depth": mid["depth"],
        "raw_rgb": mid["raw_rgb"],
        "raw_depth": mid["raw_depth"],
        "mask": mid["mask"],
    }


@dataclasses.dataclass
class FrameTimings:
    """Per-stage wall times (the reference's RENDER_TIME print,
    project_cloud.cu:490), measured with block_until_ready."""

    projection_ms: float = 0.0
    filter_ms: float = 0.0
    unet_ms: float = 0.0
    total_ms: float = 0.0

    def __str__(self) -> str:
        return (
            f"RENDER_TIME: projection[{self.projection_ms:.2f}], "
            f"filter[{self.filter_ms:.2f}], unet[{self.unet_ms:.2f}], "
            f"Total[{self.total_ms:.2f}]"
        )


class Renderer:
    """Scene-pinned render frontend (the reference's ``ProjectCloud`` role).

    Parameters
    ----------
    scene: the point cloud (uploaded to device once).
    config: heuristic constants.
    unet_variables: Flax variables for the refinement net; if None,
        ``compute_full`` is unavailable (mirrors the empty-model-filename
        branch of project_cloud.cu:247-250).
    unet_dtype: "bf16" (TPU-native) or "f32" (parity).
    """

    def __init__(
        self,
        scene: Scene,
        config: RenderConfig = RenderConfig(),
        unet_variables: Any = None,
        pad_points_to: int = 1024,
        cull_budget: Any = None,
        cull_margin_px: float = 96.0,
        cull_inflate_m: float = 0.5,
    ):
        """``cull_budget`` enables frustum culling on the 0.25 m block grid
        (the spatial structure the reference builds but never uses,
        SURVEY.md §2): per view, points of out-of-frustum blocks are
        compacted away into a fixed ``cull_budget``-point buffer, shrinking
        the per-frame sort. The compaction is CACHED and reused while the
        camera stays within ``cull_inflate_m`` meters / a rotation bounded
        by ``cull_margin_px`` pixels of the compaction pose (block AABBs are
        inflated by the same amount, so reuse is conservative, not
        approximate).

        Culling is SAFE regardless of the budget: if a view keeps more
        points than the budget, the renderer falls back to the exact
        full-cloud render for that pose region instead of dropping points
        (the compaction itself never silently truncates). ``cull_budget``
        may be an int, ``"auto"`` (sized to 1.5x the first view's kept
        count and grown on overflow), or None/0 (off)."""
        self.config = config
        pts, cols, valid = scene.sorted_by_block().device_arrays(pad_points_to)
        self.points = jnp.asarray(pts)
        self.colors = jnp.asarray(cols)
        self.valid = jnp.asarray(valid)
        self._cull_auto = cull_budget == "auto"
        self.cull_budget = None if self._cull_auto else cull_budget
        self._cull_enabled = bool(cull_budget)
        self._pad_points_to = int(pad_points_to)
        self.cull_margin_px = float(cull_margin_px)
        self.cull_inflate_m = float(cull_inflate_m)
        self._cull_cache: Optional[dict] = None
        if self._cull_enabled:
            from rtnr_tpu.ops.culling import build_block_index

            self._block_index = build_block_index(scene, pad_to_multiple=pad_points_to)
        dtype = jnp.bfloat16 if config.unet_dtype == "bf16" else jnp.float32
        # Inference fast path: fold BatchNorm into the convs (see
        # models/fold_bn.py) whenever the checkpoint still carries running
        # stats — pure-win at inference, halving elementwise passes.
        fold = unet_variables is not None and "batch_stats" in unet_variables
        if fold:
            from rtnr_tpu.models.fold_bn import fold_batchnorm

            unet_variables = fold_batchnorm(unet_variables)
        if unet_variables is not None:
            # pin the (inference-constant) weights on device ONCE: host
            # numpy leaves would be re-transferred on EVERY compute_*
            # call — ~124 MB/frame for the full-width net (seconds/frame
            # over a remote-device link, and a needless host->device copy
            # even locally)
            unet_variables = jax.device_put(unet_variables)
        self.unet_variables = unet_variables
        self.unet = UNet(features=tuple(config.unet_features),
                         out_channels=config.unet_out_channels, dtype=dtype,
                         fold_bn=unet_variables is not None,
                         quant_int8=config.unet_int8 != "off")
        self._act_scales: Optional[dict] = None  # static-int8 calibration
        self._full_jit = jax.jit(
            functools.partial(self._full_impl),
            static_argnames=("width", "height"),
        )
        self.last_timings = FrameTimings()

    def _cam_proj(self, camera: Camera, extrinsics: np.ndarray) -> jax.Array:
        return jnp.asarray(camera.cam_proj(extrinsics), dtype=jnp.float32)

    def _view_points(
        self, camera: Camera, extrinsics: np.ndarray
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Scene arrays for this view: full cloud, or the cached culled
        compaction (recomputed only when the pose leaves the cached
        compaction's conservative validity region). If the view keeps more
        points than the budget, the EXACT full cloud is returned (and
        cached for the region) — culling never drops visible points."""
        if not self._cull_enabled:
            return self.points, self.colors, self.valid
        E = np.asarray(extrinsics, np.float64)
        R, t = E[:3, :3], E[:3, 3]
        C = -R.T @ t  # camera center in world space
        f = min(camera.fx, camera.fy)
        # rotation budget: pixel shift at the image edge <= margin/2
        # (shift <= f * dtheta * sec^2(alpha_max), alpha_max at the corner)
        sec2 = 1.0 + (max(camera.width, camera.height) / (2.0 * f)) ** 2
        rot_budget_rad = self.cull_margin_px / (2.0 * f * sec2)

        cache = self._cull_cache
        if cache is not None and cache["wh"] == (camera.width, camera.height):
            cosang = (np.trace(cache["R"].T @ R) - 1.0) / 2.0
            ang = float(np.arccos(np.clip(cosang, -1.0, 1.0)))
            if (
                float(np.linalg.norm(C - cache["C"])) <= self.cull_inflate_m
                and ang <= rot_budget_rad
            ):
                return cache["arrays"]

        from rtnr_tpu.ops.culling import compact_points, cull_points

        M = self._cam_proj(camera, extrinsics)
        keep = cull_points(
            self._block_index, M, self.valid,
            width=camera.width, height=camera.height,
            margin=self.cull_margin_px, inflate_m=self.cull_inflate_m,
        )
        n_kept = int(np.asarray(jnp.sum(keep.astype(jnp.int32))))
        pad = self._pad_points_to
        if self._cull_auto and (
            self.cull_budget is None or n_kept > self.cull_budget
        ):
            # size (or grow, on overflow) the budget to 1.5x the kept count
            self.cull_budget = min(
                -(-int(1.5 * max(n_kept, 1)) // pad) * pad,
                int(self.points.shape[0]),
            )
        if n_kept > (self.cull_budget or 0):
            # overflow: the compaction would drop visible points — render
            # the exact full cloud for this pose region instead
            arrays = (self.points, self.colors, self.valid)
            overflowed = True
        else:
            arrays = compact_points(self.points, self.colors, keep, self.cull_budget)
            overflowed = False
        self._cull_cache = {
            "arrays": arrays, "C": C, "R": R,
            "wh": (camera.width, camera.height),
            "n_kept": n_kept, "overflowed": overflowed,
        }
        return arrays

    def compute_rgbd(self, camera: Camera, extrinsics: np.ndarray) -> Dict[str, np.ndarray]:
        pts, cols, valid = self._view_points(camera, extrinsics)
        t0 = time.perf_counter()
        out = render_rgbd(
            pts, cols, valid, self._cam_proj(camera, extrinsics),
            width=camera.width, height=camera.height, depth_band=self.config.depth_band,
        )
        out = jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1e3
        self.last_timings = FrameTimings(projection_ms=dt, total_ms=dt)
        return {k: np.asarray(v) for k, v in out.items()}

    def compute_filtered_rgbd(
        self, camera: Camera, extrinsics: np.ndarray, timings: bool = False
    ) -> Dict[str, np.ndarray]:
        if timings or getattr(self.config, "stage_timing", False):
            stage_raster, stage_filter, _ = self._stage_jits()
            pts, cols, valid = self._view_points(camera, extrinsics)
            w, h = camera.width, camera.height
            M = self._cam_proj(camera, extrinsics)
            t0 = time.perf_counter()
            raw_rgb, raw_depth = jax.block_until_ready(
                stage_raster(pts, cols, valid, M, width=w, height=h)
            )
            t1 = time.perf_counter()
            mid = jax.block_until_ready(stage_filter(raw_rgb, raw_depth, height=h, width=w))
            t2 = time.perf_counter()
            self.last_timings = FrameTimings(
                projection_ms=(t1 - t0) * 1e3, filter_ms=(t2 - t1) * 1e3,
                total_ms=(t2 - t0) * 1e3,
            )
            out = dict(mid, raw_rgb=raw_rgb, raw_depth=raw_depth)
            return {k: np.asarray(v) for k, v in out.items()}
        pts, cols, valid = self._view_points(camera, extrinsics)
        t0 = time.perf_counter()
        out = render_filtered(
            pts, cols, valid, self._cam_proj(camera, extrinsics),
            width=camera.width, height=camera.height, depth_band=self.config.depth_band,
            levels=self.config.pyramid_levels,
            filter_strength=self.config.filter_strength,
            gradient_filter=self.config.gradient_filter,
        )
        out = jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1e3
        self.last_timings = FrameTimings(filter_ms=dt, total_ms=dt)
        return {k: np.asarray(v) for k, v in out.items()}

    def _full_impl(self, points, colors, valid, cam_proj, unet_variables,
                   act_scales, *, width, height):
        return render_full(
            points, colors, valid, cam_proj, self.unet, unet_variables,
            width=width, height=height, depth_band=self.config.depth_band,
            levels=self.config.pyramid_levels,
            filter_strength=self.config.filter_strength,
            gradient_filter=self.config.gradient_filter,
            act_scales=act_scales,
        )

    def _ensure_act_scales(self, pts, cols, valid, M, width, height):
        """Lazy static-int8 calibration: one exact forward on THIS view's
        real U-Net input records per-layer activation maxes (config
        unet_int8='static')."""
        import os

        from rtnr_tpu.models.unet import calibrate_act_scales, phase_input_ok
        from rtnr_tpu.ops.conv_phase import to_phase

        if (self.config.unet_int8 != "static" or self._act_scales is not None
                or self.unet_variables is None):
            return
        levels = self.config.pyramid_levels
        ph, pw = pyramid_pad_shape(height, width, levels)
        force = os.environ.get("RTNR_SPLIT_FORCE") == "1"
        if not (levels == len(self.unet.features)
                and phase_input_ok(self.unet, ph, pw, force=force)):
            return  # phase path inactive at this shape; scales unused
        mid = render_filtered(
            pts, cols, valid, M, width=width, height=height,
            depth_band=self.config.depth_band, levels=levels,
            filter_strength=self.config.filter_strength,
            gradient_filter=self.config.gradient_filter,
        )
        xp = to_phase(mid["unet_input"][None].astype(jnp.bfloat16),
                      1 << len(self.unet.features))
        self._act_scales = calibrate_act_scales(
            self.unet, self.unet_variables, x_phase=(xp, ph, pw, 5)
        )

    def compute_full(
        self, camera: Camera, extrinsics: np.ndarray, timings: bool = False
    ) -> Dict[str, np.ndarray]:
        """Full neural render. ``timings=True`` (or config.stage_timing)
        executes the three stages as separate device programs with a
        synchronization between each, so ``last_timings`` carries real
        per-stage wall times — the reference's per-frame
        ``RENDER_TIME: projection[..] filter[..] unet[..]`` print
        (project_cloud.cu:490). The default path keeps the fully-fused
        single program (faster; stages can't be told apart inside XLA)."""
        if self.unet_variables is None:
            raise RuntimeError("No U-Net variables given; compute_full unavailable.")
        if timings or getattr(self.config, "stage_timing", False):
            return self._compute_full_staged(camera, extrinsics)
        pts, cols, valid = self._view_points(camera, extrinsics)
        M = self._cam_proj(camera, extrinsics)
        self._ensure_act_scales(pts, cols, valid, M,
                                camera.width, camera.height)
        t0 = time.perf_counter()
        out = self._full_jit(
            pts, cols, valid, M, self.unet_variables, self._act_scales,
            width=camera.width, height=camera.height,
        )
        out = jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1e3
        self.last_timings = FrameTimings(unet_ms=dt, total_ms=dt)
        return {k: np.asarray(v) for k, v in out.items()}

    # ---- stage-split path (per-stage timing parity) ----
    def _stage_jits(self):
        if not hasattr(self, "_staged"):
            cfg = self.config

            @functools.partial(jax.jit, static_argnames=("width", "height"))
            def stage_raster(points, colors, valid, cam_proj, *, width, height):
                from rtnr_tpu.ops.raster import rasterize

                return rasterize(
                    points, colors, cam_proj, width=width, height=height,
                    valid=valid, depth_band=cfg.depth_band,
                )

            @functools.partial(jax.jit, static_argnames=("height", "width"))
            def stage_filter(rgb, depth, *, height, width):
                dpad, cpad = pad_to_pyramid(depth, rgb, cfg.pyramid_levels)
                out = depth_prefilter(
                    dpad, cpad, levels=cfg.pyramid_levels,
                    filter_strength=cfg.filter_strength,
                    gradient_filter=cfg.gradient_filter,
                )
                return {
                    "rgb": out["filtered_rgb"][:height, :width],
                    "depth": out["filtered_depth"][:height, :width],
                    "mask": out["mask"][:height, :width],
                    "unet_input": out["unet_input"],
                }

            @functools.partial(jax.jit, static_argnames=("height", "width"))
            def stage_unet(unet_input, variables, act_scales, *, height, width):
                # act_scales threaded so unet_int8='static' measures the
                # same static path the fused default runs (not dynamic int8)
                y = self.unet.apply(
                    variables, unet_input[None], act_scales=act_scales
                )[0].astype(jnp.float32)
                y = y[:height, :width]
                rgb8 = jnp.clip(jnp.rint(y * 255.0), 0, 255).astype(jnp.uint8)
                return {"rgb": rgb8, "rgb_f": y}

            self._staged = (stage_raster, stage_filter, stage_unet)
        return self._staged

    def _compute_full_staged(self, camera: Camera, extrinsics: np.ndarray) -> Dict[str, np.ndarray]:
        stage_raster, stage_filter, stage_unet = self._stage_jits()
        pts, cols, valid = self._view_points(camera, extrinsics)
        w, h = camera.width, camera.height
        M = self._cam_proj(camera, extrinsics)
        self._ensure_act_scales(pts, cols, valid, M, w, h)

        t0 = time.perf_counter()
        raw_rgb, raw_depth = jax.block_until_ready(
            stage_raster(pts, cols, valid, M, width=w, height=h)
        )
        t1 = time.perf_counter()
        mid = jax.block_until_ready(stage_filter(raw_rgb, raw_depth, height=h, width=w))
        t2 = time.perf_counter()
        fin = jax.block_until_ready(
            stage_unet(mid["unet_input"], self.unet_variables,
                       self._act_scales, height=h, width=w)
        )
        t3 = time.perf_counter()

        self.last_timings = FrameTimings(
            projection_ms=(t1 - t0) * 1e3,
            filter_ms=(t2 - t1) * 1e3,
            unet_ms=(t3 - t2) * 1e3,
            total_ms=(t3 - t0) * 1e3,
        )
        out = {
            "rgb": fin["rgb"], "rgb_f": fin["rgb_f"], "depth": mid["depth"],
            "raw_rgb": raw_rgb, "raw_depth": raw_depth, "mask": mid["mask"],
        }
        return {k: np.asarray(v) for k, v in out.items()}
