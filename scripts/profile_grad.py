"""Per-HLO-op profile of the differentiable-raster gradient step.

Same harness as scripts/profile_xplane.py, but over the bench_grad.py
workload (jax.grad of the masked-L2 loss through rasterize_diff_sorted at
5M pts / 1080p). Prints the top HLO ops by total self time so the backward
cost (sorts vs scans vs glue) can be attributed precisely.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_grad.py [top_n]
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


def main():
    import jax
    import jax.numpy as jnp

    from rtnr_tpu.camera import Camera
    from rtnr_tpu.ops.raster_diff import rasterize_diff_sorted
    from rtnr_tpu.scene import Scene

    top_n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    print(f"backend: {jax.devices()[0]}", flush=True)

    scene = Scene.synthetic(N_POINTS, seed=0, extent=10.0)
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    points = jnp.asarray(pts)
    colors = jnp.asarray(cols, jnp.float32)
    validd = jnp.asarray(valid)
    cam = Camera.from_params(1100.0, 1100.0, WIDTH / 2, HEIGHT / 2, WIDTH, HEIGHT)
    E = np.eye(4)
    E[2, 3] = 12.0
    M0 = jnp.asarray(cam.cam_proj(E), jnp.float32)
    key = jax.random.PRNGKey(0)
    target = jax.random.uniform(key, (HEIGHT, WIDTH, 3), jnp.float32, 0.0, 255.0)

    def loss(points, colors, M):
        out = rasterize_diff_sorted(
            points, colors, M, width=WIDTH, height=HEIGHT, valid=validd
        )
        diff = (out.rgb - target) * out.mask[..., None]
        return jnp.mean(diff * diff) + jnp.sum(
            jnp.where(out.mask, out.depth, 0.0)
        ) * jnp.float32(1e-9)

    grad = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))

    @jax.jit
    def run(d):
        gp, gc, gm = grad(points, colors, M0.at[0, 3].add(d))
        return d + gm[2, 3] * jnp.float32(1e-6) + gc[0, 0] * jnp.float32(1e-9)

    x = jax.block_until_ready(run(jnp.float32(0.0)))  # compile + warm

    logdir = tempfile.mkdtemp(prefix="xprof_grad_")
    with jax.profiler.trace(logdir):
        for _ in range(REPS):
            x = run(x)
        jax.block_until_ready(x)

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("NO TRACE CAPTURED")
        return

    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode(errors="replace")
    out_path = "/tmp/hlo_stats_grad.json"
    with open(out_path, "w") as f:
        f.write(data)
    print(f"wrote {out_path} ({len(data)} bytes)", flush=True)

    rows = json.loads(data)
    cols = [c.get("label") or c.get("id") for c in rows["cols"]]
    i_cat = cols.index("HLO op category") if "HLO op category" in cols else None
    i_name = cols.index("HLO op name") if "HLO op name" in cols else 0
    i_time = None
    for cand in ("Total self time (us)", "Self time (us)", "selfTimeUs"):
        if cand in cols:
            i_time = cols.index(cand)
            break
    entries = []
    for r in rows["rows"]:
        c = r["c"]
        name = c[i_name].get("v")
        t = float(c[i_time].get("v") or 0.0)
        cat = c[i_cat].get("v") if i_cat is not None else ""
        entries.append((t, name, cat))
    entries.sort(reverse=True)
    tot = sum(t for t, _, _ in entries)
    print(f"total self time: {tot / REPS / 1e3:.2f} ms/step over {REPS} reps")
    for t, name, cat in entries[:top_n]:
        print(f"{t / REPS / 1e3:9.3f} ms  {cat:18s} {name[:110]}")


if __name__ == "__main__":
    main()
