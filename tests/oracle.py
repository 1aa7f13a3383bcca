"""Slow, loop-based numpy oracles for the render pipeline.

Written directly from the reference kernel semantics (see file:line notes in
each function) as an *independent* implementation to golden-test the JAX/XLA
ops against. Everything is float32 to match CUDA arithmetic.
"""

from __future__ import annotations

import numpy as np

FLT_MAX = np.float32(np.finfo(np.float32).max)  # 0x7F7FFFFF
MAX_FLOAT = np.float32(3.4028e38)  # reference project_cloud.cu:21


def oracle_project(points: np.ndarray, cam_proj: np.ndarray):
    """reference render.cu:33-40 (matmul, w=1) + :63-68 (cull + rint)."""
    M = cam_proj.astype(np.float32)
    p = points.astype(np.float32)
    r = p @ M[:3, :3].T + M[:3, 3]
    z = r[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = np.rint(r[:, 0] / z)
        v = np.rint(r[:, 1] / z)
    return u, v, z


def oracle_rasterize(points, colors, cam_proj, width, height, depth_band=0.02, valid=None):
    """reference render.cu:53-163: min-depth pass, 2cm-band accumulate,
    integer-average resolve. Returns (rgb uint8 (H,W,3), depth f32 (H,W))."""
    n = points.shape[0]
    if valid is None:
        valid = np.ones(n, bool)
    u, v, z = oracle_project(points, cam_proj)
    depth = np.full((height, width), FLT_MAX, np.float32)
    ok = valid & (z > 0)
    uu = u.astype(np.int64, copy=False)
    vv = v.astype(np.int64, copy=False)
    inb = ok & (u >= 0) & (u < width) & (v >= 0) & (v < height)
    for i in np.flatnonzero(inb):
        y, x = vv[i], uu[i]
        if np.float32(z[i]) < depth[y, x]:
            depth[y, x] = np.float32(z[i])
    sums = np.zeros((height, width, 4), np.uint64)
    for i in np.flatnonzero(inb):
        y, x = vv[i], uu[i]
        if not (np.float32(z[i]) > depth[y, x] + np.float32(depth_band)):
            sums[y, x, :3] += colors[i].astype(np.uint64)
            sums[y, x, 3] += 1
    rgb = np.zeros((height, width, 3), np.uint8)
    cnt = sums[..., 3]
    nz = cnt > 0
    rgb[nz] = (sums[nz, :3] // cnt[nz, None]).astype(np.uint8)
    return rgb, depth


def oracle_min_pyramid(depth: np.ndarray, levels: int):
    """reference project_cloud.cu:28-53 (2x2 min reduce per level)."""
    pyr = [depth.astype(np.float32).copy()]
    for _ in range(levels):
        prev = pyr[-1]
        h, w = prev.shape[0] // 2, prev.shape[1] // 2
        out = np.empty((h, w), np.float32)
        for y in range(h):
            for x in range(w):
                q = prev[2 * y : 2 * y + 2, 2 * x : 2 * x + 2]
                a = q[0, 0] if q[0, 0] < q[0, 1] else q[0, 1]
                b = q[1, 0] if q[1, 0] < q[1, 1] else q[1, 1]
                out[y, x] = a if a < b else b
        pyr.append(out)
    return pyr


_LAPL = np.array([0, 1, 0, 1, -4, 1, 0, 1, 0], np.float32)


def oracle_laplacian_mask(x: np.ndarray, gradient_filter: float):
    """reference project_cloud.cu:55-79 (ordered f32 accumulation)."""
    h, w = x.shape
    out = np.zeros((h, w), bool)
    gf = np.float32(gradient_filter)
    for y in range(1, h - 1):
        for x_ in range(1, w - 1):
            s = np.float32(0.0)
            c = 0
            for ky in (-1, 0, 1):
                for kx in (-1, 0, 1):
                    s = np.float32(s + np.float32(x[y + ky, x_ + kx] * _LAPL[c]))
                    c += 1
            out[y, x_] = bool(s > gf)
    return out


def oracle_compare(low, high, grad_mask, filter_strength):
    """reference project_cloud.cu:88-126."""
    fs = np.float32(filter_strength)
    hh, hw = high.shape
    lh, lw = low.shape
    keep = np.zeros((hh, hw), bool)

    def gp(x, y):
        if 0 <= x < lw and 0 <= y < lh:
            return low[y, x]
        return np.float32(-1.0)

    for y in range(hh):
        for x in range(hw):
            cv = high[y, x]
            if cv >= MAX_FLOAT:
                continue
            lx, ly = x // 2, y // 2
            if grad_mask[ly, lx]:
                hit = False
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        if cv <= np.float32(gp(lx + dx, ly + dy) * fs):
                            hit = True
                keep[y, x] = hit
            else:
                keep[y, x] = bool(cv <= np.float32(low[ly, lx] * fs))
    return keep


def oracle_resize(low, high, keep_mask):
    """reference project_cloud.cu:128-161 (bilinear refill of rejects,
    weights against clamped indices)."""
    oh, ow = high.shape
    lh, lw = low.shape
    out = high.copy()
    for y in range(oh):
        for x in range(ow):
            if keep_mask[y, x]:
                continue
            inx = np.float32((x + 0.5) / 2.0 - 0.5)
            iny = np.float32((y + 0.5) / 2.0 - 0.5)
            x0 = int(np.floor(inx))
            x1 = x0 + 1
            y0 = int(np.floor(iny))
            y1 = y0 + 1
            x0 = min(max(x0, 0), lw - 1)
            x1 = min(max(x1, 0), lw - 1)
            y0 = min(max(y0, 0), lh - 1)
            y1 = min(max(y1, 0), lh - 1)
            wx = np.float32(inx - x0)
            wy = np.float32(iny - y0)
            v0 = np.float32(np.float32((1 - wx) * low[y0, x0]) + np.float32(wx * low[y0, x1]))
            v1 = np.float32(np.float32((1 - wx) * low[y1, x0]) + np.float32(wx * low[y1, x1]))
            out[y, x] = np.float32(np.float32((1 - wy) * v0) + np.float32(wy * v1))
    return out


def oracle_prefilter(depth, rgb, levels=4, filter_strength=1.025, gradient_filter=0.03):
    """Full coarse-to-fine driver (reference project_cloud.cu:331-392) +
    removeMask packing (:163-187). Returns dict like ops.depth_prefilter."""
    depth = depth.astype(np.float32)
    pyr = oracle_min_pyramid(depth, levels)
    keep = None
    for i in range(levels, 0, -1):
        grad = oracle_laplacian_mask(pyr[i], gradient_filter)
        keep = oracle_compare(pyr[i], pyr[i - 1], grad, filter_strength)
        if i > 1:
            pyr[i - 1] = oracle_resize(pyr[i], pyr[i - 1], keep)

    occ = depth != FLT_MAX
    if occ.any():
        dmin = depth[occ].min()
        dmax = depth[occ].max()
    else:
        dmin, dmax = np.float32(np.inf), np.float32(-np.inf)

    h, w = depth.shape
    packed = np.zeros((h, w, 5), np.float32)
    packed[..., :3] = np.where(keep[..., None], rgb.astype(np.float32) / 255.0, 0.0)
    packed[..., 3] = keep.astype(np.float32)
    packed[..., 4] = np.where(keep, (depth - dmin) / (dmax - dmin), np.float32(-1.0))
    fdepth = np.where(keep, depth, np.float32(-1.0))
    frgb = np.where(keep[..., None], rgb, 0).astype(np.uint8)
    return {
        "unet_input": packed,
        "filtered_depth": fdepth,
        "filtered_rgb": frgb,
        "mask": keep,
        "depth_min": dmin,
        "depth_max": dmax,
    }
