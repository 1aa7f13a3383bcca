"""Bucketed-sort feasibility, round 2: device-profiler ground truth.

Wall-clock timing of isolated sorts on the axon backend reports garbage
(~0.06 ms for the 11.2 ms production sort) no matter how the chained loop
is perturbed — so this script captures an xprof trace instead and reads
per-op device times from hlo_stats, the same attribution that reconciles
with bench.py for the full pipeline (PROFILE_r04.md).

Measured building blocks (one program executes all candidates REPS times):
  sort_global   (N,) 2-key 3-lane             — the production sort
  sort_chunk    (C, 32768) 2-key 3-lane       — pass 1 analog
  sort_bucket   (256, C*R) 2-key 3-lane       — pass 2 analog (1.25x pad)
  regroup       (C,B,R)->(B,C,R) transpose x3 — relayout analog
  gather_rows   (C*B, R)-row gather from (C, L) by per-(c,b) starts —
                the regroup's actual dynamic-slice work
"""

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

N = int(os.environ.get("BENCH_POINTS", 5_000_000))
REPS = int(os.environ.get("PROF_REPS", 5))


def main():
    print(f"backend: {jax.devices()[0]} n={N}", flush=True)
    rng = np.random.default_rng(0)
    hw = 1920 * 1080
    pix = np.sort(rng.integers(0, hw, N).astype(np.int32))
    perm = np.argsort(
        rng.standard_normal(-(-N // 1024)).repeat(1024)[:N], kind="stable"
    )
    pix = np.ascontiguousarray(pix[perm])
    zb = rng.integers(0, 1 << 30, N).astype(np.int32)
    pk = rng.integers(0, 1 << 24, N).astype(np.int32)
    a = list(map(jnp.asarray, (pix, zb, pk)))

    L = 32768
    C = -(-N // L)
    pad = C * L - N
    B, R = 256, 160
    M2 = B * C * R
    p2 = jnp.asarray(rng.integers(0, hw, M2).astype(np.int32)).reshape(B, C * R)
    z2 = jnp.asarray(rng.integers(0, 1 << 30, M2).astype(np.int32)).reshape(B, C * R)
    c2 = jnp.asarray(rng.integers(0, 1 << 24, M2).astype(np.int32)).reshape(B, C * R)
    # per-(c,b) window starts in [0, L-R): monotone within each chunk
    st = np.minimum(
        np.sort(rng.integers(0, L - R, (C, B)).astype(np.int32), axis=1),
        L - R,
    )
    starts = jnp.asarray(st)

    @jax.jit
    def run(s0):
        acc = s0
        for _ in range(REPS):
            px = a[0] ^ (acc & 7)
            ps, zs, cs = jax.lax.sort((px, a[1], a[2]), num_keys=2,
                                      is_stable=False)
            acc = acc + ps[0] + zs[-1] + cs[N // 2]

            pp = jnp.concatenate([px, jnp.full((pad,), hw, jnp.int32)]).reshape(C, L)
            zz = jnp.concatenate([a[1], jnp.zeros((pad,), jnp.int32)]).reshape(C, L)
            cc = jnp.concatenate([a[2], jnp.zeros((pad,), jnp.int32)]).reshape(C, L)
            p1, z1, c1 = jax.lax.sort((pp, zz, cc), dimension=1, num_keys=2,
                                      is_stable=False)
            acc = acc + p1[0, 0] + z1[-1, -1] + c1[C // 2, L // 2]

            p2x = p2 ^ (acc & 7)
            pb, zb2, cb = jax.lax.sort((p2x, z2, c2), dimension=1, num_keys=2,
                                       is_stable=False)
            acc = acc + pb[0, 0] + zb2[-1, -1] + cb[B // 2, 7]

            f = lambda x: jnp.transpose(x.reshape(B, C, R), (1, 0, 2))
            acc = acc + f(pb ^ acc)[0, 0, 0] + f(zb2)[0, 0, 0] + f(cb)[0, 0, 0]

            # regroup gather: (C, B, R) rows sliced from the chunk-sorted
            # lanes at dynamic starts (contiguous R-element rows)
            idx = (starts ^ 0)[:, :, None] + jnp.arange(R, dtype=jnp.int32)
            ga = jnp.take_along_axis(
                p1[:, None, :], idx ^ (0 * (acc & 1)), axis=2
            )
            gb = jnp.take_along_axis(z1[:, None, :], idx, axis=2)
            gc = jnp.take_along_axis(c1[:, None, :], idx, axis=2)
            acc = acc + ga[0, 0, 0] + gb[C // 2, B // 2, 0] + gc[-1, -1, -1]
        return acc

    x = jax.block_until_ready(run(jnp.int32(0)))
    logdir = tempfile.mkdtemp(prefix="xprof_sortb_")
    with jax.profiler.trace(logdir):
        jax.block_until_ready(run(jnp.int32(1)))

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    print(f"xplane files: {paths}", flush=True)
    from xprof.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode(errors="replace")
    d = json.loads(data)
    cols = [c.get("label") or c.get("id") for c in d["cols"]]
    i_name = cols.index("HLO op name")
    i_t = cols.index("Total self time (us)")
    i_cat = cols.index("HLO op category")
    rows = []
    for rr in d["rows"]:
        c = [(cell or {}).get("v") for cell in rr["c"]]
        rows.append((float(c[i_t] or 0) / REPS / 1000, c[i_name], c[i_cat]))
    rows.sort(reverse=True)
    for t, name, cat in rows[:25]:
        print(f"{t:8.3f} ms  {name[:50]:52s} {cat}")


if __name__ == "__main__":
    main()
