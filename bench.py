"""Benchmark: full neural render (raster + prefilter + U-Net) at 1920x1080.

Prints ONE JSON line: frames/sec per chip vs the 30 FPS north-star target
(BASELINE.md). Runs on whatever backend the environment provides (real TPU
chip under the driver; CPU fallback works but is slow).

Scene: 5M-point synthetic cloud (the ScanNet++-room-scale config of
BASELINE.json), full-width U-Net [64,128,256,512] with folded BatchNorm.
The trajectory renders inside one executable (lax.fori_loop over per-frame
cameras) — the framework's deployment shape — so host dispatch overhead
doesn't pollute the device measurement.

Two precisions are reported every run (VERDICT r5 item 3):
- headline ``value``: the deployment path (calibrated static-int8 U-Net;
  error budget pinned in PARITY.md, the same precision-for-speed trade as
  the reference's fp16 TensorRT export, model/export_ts.py:16);
- ``fps_bf16_exact``: the exact-bf16 pipeline all parity claims attach to.
BENCH_UNET_INT8=off makes bf16 the headline; BENCH_BOTH=0 skips the
second compile. BENCH_BATCH=N renders N frames per loop step (throughput
shape — amortizes the per-step launch floor; N=1 is the latency shape).
"""

import json
import os
import sys
import time

import numpy as np


def main() -> None:
    n_points = int(os.environ.get("BENCH_POINTS", 5_000_000))
    width = int(os.environ.get("BENCH_WIDTH", 1920))
    height = int(os.environ.get("BENCH_HEIGHT", 1080))
    frames = int(os.environ.get("BENCH_FRAMES", 20))
    batch = int(os.environ.get("BENCH_BATCH", 1))
    baseline_fps = 30.0

    import jax
    import jax.numpy as jnp

    from rtnr_tpu.utils.checkpoint import enable_compilation_cache

    enable_compilation_cache()

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, init_unet
    from rtnr_tpu.pipeline import render_full
    from rtnr_tpu.scene import Scene

    features = (64, 128, 256, 512)
    scene = Scene.synthetic(n_points, seed=0, extent=10.0)
    cam = Camera.from_params(1100.0, 1100.0, width / 2, height / 2, width, height)
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)

    int8_mode = os.environ.get("BENCH_UNET_INT8", "static")
    if int8_mode != "off":
        # the int8 paths live in the phase kernels; at shapes the phase
        # layout doesn't support (pipeline.Renderer makes the same check)
        # the bench degrades to the exact bf16/XLA path and says so
        from rtnr_tpu.models.unet import UNet as _U, phase_input_ok
        from rtnr_tpu.pipeline import pyramid_pad_shape as _pps

        _ph, _pw = _pps(height, width, 4)
        if not phase_input_ok(
            _U(features=features, dtype=jnp.bfloat16, fold_bn=True,
               quant_int8=True),
            _ph, _pw,
        ):
            print(f"# phase layout unsupported at {width}x{height}: "
                  "falling back to bf16", file=sys.stderr, flush=True)
            int8_mode = "off"
    both = os.environ.get("BENCH_BOTH", "1") == "1" and int8_mode == "static"
    # init on host CPU: avoids a throwaway accelerator compile of flax init
    with jax.default_device(jax.devices("cpu")[0]):
        _, raw_variables = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
    variables = fold_batchnorm(raw_variables)

    points = jnp.asarray(pts)
    colors = jnp.asarray(cols)
    validd = jnp.asarray(valid)

    E = np.eye(4)
    E[2, 3] = 12.0
    M0 = jnp.asarray(cam.cam_proj(E), jnp.float32)

    unet_int8 = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                     quant_int8=True)
    unet_bf16 = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                     quant_int8=False)

    act_scales = None
    if int8_mode == "static":
        from rtnr_tpu.models.unet import calibrate_act_scales
        from rtnr_tpu.ops.conv_phase import to_phase
        from rtnr_tpu.pipeline import pyramid_pad_shape, render_filtered

        print("# calibrating int8 scales on frame 0...", file=sys.stderr,
              flush=True)
        mid = render_filtered(points, colors, validd, M0,
                              width=width, height=height)
        ph, pw = pyramid_pad_shape(height, width, 4)
        xp = to_phase(mid["unet_input"][None].astype(jnp.bfloat16),
                      1 << len(features))
        act_scales = calibrate_act_scales(unet_int8, variables,
                                          x_phase=(xp, ph, pw, 5))

    def make_trajectory(unet, scales):
        def one_frame(M):
            out = render_full(
                points, colors, validd, M, unet, variables,
                width=width, height=height, act_scales=scales,
            )
            # consume the frame so nothing is dead-code-eliminated
            return (
                out["rgb"][0, 0, 0].astype(jnp.float32)
                + out["raw_depth"][0, 0]
                + out["rgb_f"][height // 2, width // 2, 1]
            )

        n_steps = -(-frames // batch)

        @jax.jit
        def render_trajectory(dx):
            def body(k, acc):
                for j in range(batch):
                    M = M0.at[0, 3].add(
                        dx * (k * batch + j).astype(jnp.float32))
                    acc = acc + one_frame(M)
                return acc

            return jax.lax.fori_loop(0, n_steps, body, jnp.float32(0.0))

        return render_trajectory, n_steps * batch

    def measure(render_trajectory, total_frames, tag):
        print(f"# compiling {tag} ({n_points} pts, {width}x{height}, "
              f"batch {batch})...", file=sys.stderr, flush=True)
        jax.block_until_ready(render_trajectory(jnp.float32(0.01)))
        print(f"# timing {tag}...", file=sys.stderr, flush=True)
        # chip-state (clock/thermal) variance at this scale is ~±1 fps
        # between sessions (PROFILE_r03.md); report the median of several
        # in-process trials so round-over-round deltas are meaningful
        n_trials = int(os.environ.get("BENCH_TRIALS", 3))
        trials = []
        for t in range(n_trials):
            t0 = time.perf_counter()
            out = render_trajectory(jnp.float32(0.02 + 0.001 * t))
            jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            trials.append(round(total_frames / dt, 3))
        return sorted(trials)[len(trials) // 2], trials

    if int8_mode == "off":
        traj, total = make_trajectory(unet_bf16, None)
        fps, trials = measure(traj, total, "bf16")
        fps_bf16 = fps
    else:
        traj, total = make_trajectory(unet_int8, act_scales)
        fps, trials = measure(traj, total, "int8")
        fps_bf16 = None
        if both:
            traj_b, total_b = make_trajectory(unet_bf16, None)
            fps_bf16, _ = measure(traj_b, total_b, "bf16")

    rec = {
        "metric": f"fps_{width}x{height}_full_pipeline_{n_points // 1_000_000}Mpts",
        "value": fps,
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "trials": trials,
        # self-describing numerics (ADVICE r4): headline precision mode
        "unet_int8": int8_mode,
        "batch": batch,
        # BASELINE.md throughput counters
        "points_per_s": round(fps * n_points, 0),
        "pixels_per_s": round(fps * width * height, 0),
        "ms_per_frame": round(1e3 / fps, 2),
    }
    if fps_bf16 is not None and int8_mode != "off":
        rec["fps_bf16_exact"] = fps_bf16
        rec["ms_per_frame_bf16"] = round(1e3 / fps_bf16, 2)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
