"""v5 raster breakdown at the bench shape (chained-loop methodology):
nk1 sort alone, winners kernel alone, full v5, full v4 — all comparable."""
import os, sys, time
import numpy as np

REPS = int(os.environ.get("BENCH_REPS", 20))
N_POINTS = int(os.environ.get("BENCH_POINTS", 5_000_000))
WIDTH, HEIGHT = 1920, 1080

def run_loop(make_body, init, reps=REPS):
    import jax
    @jax.jit
    def run(init):
        import jax.lax as lax
        return lax.fori_loop(0, reps, make_body, init)
    jax.block_until_ready(run(init))
    t0 = time.perf_counter()
    jax.block_until_ready(run(init))
    return (time.perf_counter() - t0) / reps * 1e3

def main():
    import jax, jax.numpy as jnp
    from rtnr_tpu.camera import Camera
    from rtnr_tpu.scene import Scene
    from rtnr_tpu.ops.raster import project_and_sort
    from rtnr_tpu.ops.raster_pallas4 import raster_images_pallas4
    from rtnr_tpu.ops.raster_pallas5 import raster_images_pallas5

    print(f"backend: {jax.devices()[0]} reps={REPS}", flush=True)
    scene = Scene.synthetic(N_POINTS, seed=0, extent=10.0)
    pts, cols, valid = scene.sorted_by_block().device_arrays(1024)
    points, colors, validd = jnp.asarray(pts), jnp.asarray(cols), jnp.asarray(valid)
    cam = Camera.from_params(1100.0, 1100.0, WIDTH/2, HEIGHT/2, WIDTH, HEIGHT)
    E = np.eye(4); E[2,3] = 12.0
    M0 = jnp.asarray(cam.cam_proj(E), jnp.float32)
    hw = WIDTH*HEIGHT

    def mk_sort(depth_key):
        def body(k, acc):
            M = M0.at[0, 3].add(acc*jnp.float32(0.0) + 0.01*k.astype(jnp.float32))
            sp = project_and_sort(points, colors, M, width=WIDTH, height=HEIGHT,
                                  valid=validd, carriers=False, depth_key=depth_key)
            return acc + sp.z[0] + sp.pix[-1].astype(jnp.float32)
        return body
    print(f"sort nk2 (no carriers): {run_loop(mk_sort(True), jnp.float32(0)):7.2f} ms", flush=True)
    print(f"sort nk1 (no carriers): {run_loop(mk_sort(False), jnp.float32(0)):7.2f} ms", flush=True)

    from rtnr_tpu.ops import raster_pallas5 as r5
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    import jax.lax as lax

    def winners5_only(sp):
        # replicate the wrapper's winners stage only
        m = sp.pix.shape[0]; L = 16384; Lc = L//8; S = 2048
        P = -(-m//L); pad = P*L + 8*Lc - m
        z_bits = lax.bitcast_convert_type(sp.z, jnp.int32)
        packed = (sp.rgb[:,0] | (sp.rgb[:,1]<<8) | (sp.rgb[:,2]<<16) |
                  jnp.where(sp.is_real, jnp.int32(1<<24), 0))
        padit = lambda x, fill: jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]).reshape(-1, Lc)
        pix_p = padit(sp.pix, jnp.int32(hw))
        zb_p = padit(z_bits, lax.bitcast_convert_type(jnp.float32(jnp.inf), jnp.int32))
        packed_p = padit(packed, jnp.int32(0))
        TS = 512
        tri = (lax.broadcasted_iota(jnp.int32,(TS,TS),0) <= lax.broadcasted_iota(jnp.int32,(TS,TS),1)).astype(jnp.bfloat16)
        out_w = hw + L + 1024
        wimg, flagarr = pl.pallas_call(
            functools.partial(r5._winners_kernel5, Lc=Lc, S=S, hw=hw, depth_band=0.02),
            out_shape=[jax.ShapeDtypeStruct((8,out_w), jnp.int32), jax.ShapeDtypeStruct((8,128), jnp.int32)],
            grid=(P,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]*4,
            out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)]*2,
            scratch_shapes=[
                pltpu.VMEM((2,16,Lc), jnp.int32), pltpu.VMEM((2,16,Lc), jnp.int32),
                pltpu.VMEM((2,8,Lc), jnp.int32), pltpu.VMEM((TS,TS), jnp.bfloat16),
                pltpu.VMEM((3,8,Lc), jnp.int32), pltpu.VMEM((8,L+256), jnp.int32),
                pltpu.VMEM((8,128), jnp.int32), pltpu.SMEM((18,), jnp.int32),
                pltpu.SemaphoreType.DMA((2,3)), pltpu.SemaphoreType.DMA(()), pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(pix_p, zb_p, packed_p, tri)
        return wimg, flagarr

    def body_w5(k, acc):
        M = M0.at[0, 3].add(acc*jnp.float32(0.0) + 0.01*k.astype(jnp.float32))
        sp = project_and_sort(points, colors, M, width=WIDTH, height=HEIGHT,
                              valid=validd, carriers=False, depth_key=False)
        wimg, flagarr = winners5_only(sp)
        return acc + wimg[5, 0].astype(jnp.float32) + flagarr[0,0].astype(jnp.float32)
    print(f"sort nk1 + winners5:    {run_loop(body_w5, jnp.float32(0)):7.2f} ms", flush=True)

    def mk_full(ver):
        def body(k, acc):
            M = M0.at[0, 3].add(acc*jnp.float32(0.0) + 0.01*k.astype(jnp.float32))
            if ver == 5:
                sp = project_and_sort(points, colors, M, width=WIDTH, height=HEIGHT,
                                      valid=validd, carriers=False, depth_key=False)
                s, c, d = raster_images_pallas5(sp, hw, 0.02)
            else:
                sp = project_and_sort(points, colors, M, width=WIDTH, height=HEIGHT,
                                      valid=validd, carriers=False)
                s, c, d = raster_images_pallas4(sp, hw, 0.02)
            return acc + d[0] + s[0,0].astype(jnp.float32) + c[-1].astype(jnp.float32)
        return body
    print(f"full v5 (sort+w+exp):   {run_loop(mk_full(5), jnp.float32(0)):7.2f} ms", flush=True)
    print(f"full v4 (sort+w+exp):   {run_loop(mk_full(4), jnp.float32(0)):7.2f} ms", flush=True)

if __name__ == "__main__":
    main()
