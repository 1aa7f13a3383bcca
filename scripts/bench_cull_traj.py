"""Sustained culled playback on a MOVING interior trajectory (VERDICT r5
item 6).

bench_culling.py measures one pose; real playback (the reference's frame
loop, example/render_trajectory/main.cpp:92-100) walks through pose
regions, forcing cull-cache recompactions — each one a full-cloud device
pass (cull_points) + a host sync for the kept count + a compaction. This
script drives the production ``Renderer`` (auto budget, safe overflow
fallback) through a 120-frame interior trajectory with translation +
yaw sized to leave the 0.5 m / rotation-budget validity region many
times, and reports:

  fps_sustained     frames / total wall time (recompaction stalls included)
  recompactions     how many frames recomputed the compaction
  overflows         how many fell back to the exact full cloud
  frame_ms_median / frame_ms_p95 / frame_ms_worst (post-warmup)
  recompact_frame_ms_median   typical cost of a recompaction frame

Frame 0 (jit compile + int8 calibration) is reported separately and
excluded from the aggregates. Per-frame host dispatch is the point here —
this measures the playback UX, not the queued-dispatch device ceiling.

Measurement note: ``Renderer.compute_full`` returns the full frame as
host numpy (the reference's per-frame device->host copy,
project_cloud.cu:479) — but on THIS environment's remote-TPU tunnel that
fetch costs seconds/frame (tunnel bandwidth, not renderer time), so the
loop drives the renderer internals (``_view_points`` -> ``_full_jit``,
the identical recompaction + render path) and fetches one scalar per
frame, like bench.py. On local TPU hardware the full-frame fetch is a
PCIe-class copy and compute_full is the right call.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    n_points = int(os.environ.get("BENCH_POINTS", 5_000_000))
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 120))

    import jax

    from rtnr_tpu.utils.checkpoint import enable_compilation_cache

    enable_compilation_cache()

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.config import RenderConfig
    from rtnr_tpu.models.unet import init_unet
    from rtnr_tpu.pipeline import Renderer
    from rtnr_tpu.scene import Scene

    scene = Scene.synthetic(n_points, seed=0, extent=10.0)
    cam = Camera.from_params(1100.0, 1100.0, width / 2, height / 2,
                             width, height)
    with jax.default_device(jax.devices("cpu")[0]):
        _, variables = init_unet(jax.random.PRNGKey(0), 64, 64,
                                 features=(64, 128, 256, 512))
    int8_mode = os.environ.get("BENCH_UNET_INT8", "static")
    rdr = Renderer(scene, RenderConfig(unet_int8=int8_mode),
                   unet_variables=variables, cull_budget="auto")

    # interior walk: ~6 m of x-translation + a slow yaw sweep. Step 0.05 m
    # exits the 0.5 m compaction validity sphere every ~10 frames; the yaw
    # (0.2 deg/frame) trips the rotation budget in between, so both reuse
    # tests are exercised.
    def pose(i: int) -> np.ndarray:
        t = i / max(frames - 1, 1)
        yaw = np.deg2rad(0.2 * i - 10.0 * t)
        c, s = np.cos(yaw), np.sin(yaw)
        E = np.eye(4)
        E[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        E[0, 3] = -3.0 + 6.0 * t
        E[1, 3] = 0.3 * np.sin(4.0 * np.pi * t)
        return E

    import jax.numpy as jnp

    def render_scalar(i: int):
        """The compute_full path minus the full-frame host fetch (see
        module docstring): identical _view_points recompaction + fused
        jit, one scalar fetched."""
        E = pose(i)
        pts, cols, valid = rdr._view_points(cam, E)
        M = rdr._cam_proj(cam, E)
        rdr._ensure_act_scales(pts, cols, valid, M, cam.width, cam.height)
        out = rdr._full_jit(pts, cols, valid, M, rdr.unet_variables,
                            rdr._act_scales, width=cam.width,
                            height=cam.height)
        return float(out["rgb_f"][height // 2, width // 2, 1]
                     + out["raw_depth"][0, 0].astype(jnp.float32))

    frame_ms = []
    recompact = []
    overflow = []
    budgets = []
    t_all0 = time.perf_counter()
    for i in range(frames):
        cache_before = rdr._cull_cache
        t0 = time.perf_counter()
        out = render_scalar(i)
        dt = (time.perf_counter() - t0) * 1e3
        frame_ms.append(dt)
        rec = rdr._cull_cache is not cache_before
        recompact.append(rec)
        overflow.append(bool(rdr._cull_cache and rdr._cull_cache["overflowed"]))
        budgets.append(rdr.cull_budget)
        if i % 20 == 0 or rec and i < 25:
            print(f"# frame {i:3d}: {dt:8.1f} ms  recompact={rec} "
                  f"kept={rdr._cull_cache['n_kept'] if rdr._cull_cache else '-'}",
                  file=sys.stderr, flush=True)
        del out
    wall = time.perf_counter() - t_all0

    ms = np.array(frame_ms[1:])  # frame 0 = compile + calibration
    rc = np.array(recompact[1:])
    rec_ms = ms[rc]
    steady_ms = ms[~rc]
    print(json.dumps({
        "metric": f"culled_trajectory_{width}x{height}_{n_points // 1_000_000}Mpts",
        "frames": frames,
        "fps_sustained": round((frames - 1) / (wall - frame_ms[0] / 1e3), 3),
        "frame0_compile_calib_ms": round(frame_ms[0], 1),
        "recompactions": int(rc.sum()),
        "overflows": int(np.array(overflow[1:]).sum()),
        "cull_budget_final": budgets[-1],
        "frame_ms_median": round(float(np.median(ms)), 2),
        "frame_ms_p95": round(float(np.percentile(ms, 95)), 2),
        "frame_ms_worst": round(float(ms.max()), 2),
        "steady_frame_ms_median": round(float(np.median(steady_ms)), 2),
        "recompact_frame_ms_median":
            round(float(np.median(rec_ms)), 2) if len(rec_ms) else None,
        "unet_int8": int8_mode,
    }))


if __name__ == "__main__":
    main()
