"""Per-HLO-op time profile of a pipeline stage via jax.profiler + xprof.

Captures a device trace of N executions of the chosen stage (unet / raster /
full) and prints the top HLO ops by total self time from the hlo_stats tool
— the ground-truth breakdown that whole-program timing can't give.

Usage: PYTHONPATH=... python scripts/profile_xplane.py [unet|raster|full] [top_n]
"""

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPS = int(os.environ.get("PROF_REPS", 5))
N_POINTS = int(os.environ.get("BENCH_POINTS", 5_000_000))
WIDTH = int(os.environ.get("BENCH_WIDTH", 1920))
HEIGHT = int(os.environ.get("BENCH_HEIGHT", 1080))


def build_stage(which):
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.models.fold_bn import fold_batchnorm
    from rtnr_tpu.models.unet import UNet, init_unet
    from rtnr_tpu.pipeline import pyramid_pad_shape

    if which == "unet":
        H, W = pyramid_pad_shape(HEIGHT, WIDTH, 4)
        features = (64, 128, 256, 512)
        unet = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                    up_impl=os.environ.get("UNET_UP_IMPL", "convt"),
                    quant_int8=os.environ.get("UNET_INT8", "0") == "1")
        with jax.default_device(jax.devices("cpu")[0]):
            _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
        variables = jax.device_put(fold_batchnorm(raw))
        x0 = jnp.zeros((1, H, W, 5), jnp.bfloat16)

        @jax.jit
        def run(x):
            y = unet.apply(variables, x)
            return jnp.concatenate([y * jnp.bfloat16(1e-3), x[..., 3:]], axis=-1)

        return run, x0

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.ops.raster import rasterize
    from rtnr_tpu.scene import Scene

    if which == "full":
        from rtnr_tpu.models.fold_bn import fold_batchnorm
        from rtnr_tpu.models.unet import UNet, init_unet
        from rtnr_tpu.pipeline import render_full

        features = (64, 128, 256, 512)
        scene = Scene.synthetic(N_POINTS, seed=0, extent=10.0)
        pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
        cam = Camera.from_params(1100.0, 1100.0, WIDTH / 2, HEIGHT / 2,
                                 WIDTH, HEIGHT)
        E = np.eye(4)
        E[2, 3] = 12.0
        M0 = jnp.asarray(cam.cam_proj(E), jnp.float32)
        int8_mode = os.environ.get("UNET_INT8", "0")
        unet = UNet(features=features, dtype=jnp.bfloat16, fold_bn=True,
                    quant_int8=int8_mode != "0")
        with jax.default_device(jax.devices("cpu")[0]):
            _, raw = init_unet(jax.random.PRNGKey(0), 64, 64, features=features)
        variables = jax.device_put(fold_batchnorm(raw))
        points, colors = jnp.asarray(pts), jnp.asarray(cols)
        validd = jnp.asarray(valid)
        act_scales = None
        if int8_mode == "2":
            from rtnr_tpu.models.unet import calibrate_act_scales
            from rtnr_tpu.ops.conv_phase import to_phase
            from rtnr_tpu.pipeline import pyramid_pad_shape, render_filtered

            mid = render_filtered(points, colors, validd, M0,
                                  width=WIDTH, height=HEIGHT)
            ph, pw = pyramid_pad_shape(HEIGHT, WIDTH, 4)
            xp = to_phase(mid["unet_input"][None].astype(jnp.bfloat16), 16)
            act_scales = calibrate_act_scales(unet, variables,
                                              x_phase=(xp, ph, pw, 5))

        @jax.jit
        def run(d):
            out = render_full(points, colors, validd, M0.at[0, 3].add(d),
                              unet, variables, width=WIDTH, height=HEIGHT,
                              act_scales=act_scales)
            return (d + out["rgb_f"][0, 0, 0] * jnp.float32(1e-6)
                    + out["raw_depth"][0, 0] * jnp.float32(1e-20))

        return run, jnp.float32(0.0)

    scene = Scene.synthetic(N_POINTS, seed=0, extent=10.0)
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    points, colors = jnp.asarray(pts), jnp.asarray(cols)
    validd = jnp.asarray(valid)
    cam = Camera.from_params(1100.0, 1100.0, WIDTH / 2, HEIGHT / 2, WIDTH, HEIGHT)
    E = np.eye(4)
    E[2, 3] = 12.0
    M0 = jnp.asarray(cam.cam_proj(E), jnp.float32)

    @jax.jit
    def run(d):
        rgb, depth = rasterize(points, colors, M0.at[0, 3].add(d),
                               width=WIDTH, height=HEIGHT, valid=validd)
        return d + depth[0, 0] * jnp.float32(1e-20)

    return run, jnp.float32(0.0)


def main():
    import jax

    which = sys.argv[1] if len(sys.argv) > 1 else "unet"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    print(f"backend: {jax.devices()[0]}", flush=True)

    run, x = build_stage(which)
    x = jax.block_until_ready(run(x))  # compile + warm

    logdir = tempfile.mkdtemp(prefix=f"xprof_{which}_")
    with jax.profiler.trace(logdir):
        for _ in range(REPS):
            x = run(x)
        jax.block_until_ready(x)

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print(f"xplane files: {paths}", flush=True)
    if not paths:
        print("NO TRACE CAPTURED (profiler unsupported on this backend?)")
        return

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode(errors="replace")
    # hlo_stats returns JSON-ish table data; dump raw for robustness then a
    # best-effort per-op summary
    out_path = f"/tmp/hlo_stats_{which}.json"
    with open(out_path, "w") as f:
        f.write(data)
    print(f"wrote {out_path} ({len(data)} bytes)", flush=True)

    try:
        rows = json.loads(data)
        # GViz table: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
        if isinstance(rows, dict) and "rows" in rows:
            cols = [c.get("label") or c.get("id") for c in rows["cols"]]
            items = []
            for rr in rows["rows"]:
                items.append({c: (cell or {}).get("v") for c, cell in zip(cols, rr["c"])})
            try:
                tkey = next(k for k in items[0] if k and "total time" in k.lower())
            except StopIteration:
                tkey = None
            if tkey:
                items.sort(key=lambda d: -(d.get(tkey) or 0))
            for it in items[:top_n]:
                print(json.dumps(it)[:400], flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"(summary parse failed: {type(e).__name__}: {e}; see raw file)")


if __name__ == "__main__":
    main()
