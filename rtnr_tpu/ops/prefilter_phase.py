"""Depth prefilter computed in the packed phase-planar layout.

Same math as ops/prefilter.py (reference project_cloud.cu:20-187 —
min-depth pyramid, Laplacian edge mask, 1.025x compare, bilinear refill,
5-channel packing), but every array lives in the polyphase layout of
ops/conv_phase.py: level-l images are (h_l, P_l, 128) with
P_l = P0 / 2^l phases and column x = u*P_l + p at [*, p, u]. In this
layout the whole filter is elementwise ops, middle-axis slot slices, and
+-1 lane shifts — no width-axis strided slicing or 2x repeats for XLA to
relayout (the NHWC formulation measured 3.9 ms at 1088x1920 on v5e with
most of it layout glue), and the packed 5-channel output feeds the phase
U-Net (models/unet.py) with zero conversions.

Bit-exact vs ops/prefilter.py (tests/test_prefilter_phase.py): float32
arithmetic order is preserved (ordered Laplacian accumulation, the
coarse-res neighborhood max, bilinear weights against clamped lower
indices, the coarse-to-fine in-place refill order).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtnr_tpu.config import DEPTH_EMPTY, DEPTH_EMPTY_THRESHOLD
from rtnr_tpu.ops.raster import depth_min_max

WS = 128


def img_to_phase(x: jax.Array, P: int) -> jax.Array:
    """(H, W) -> (H, P, WS) with column x = u*P + p at [:, p, u]; lanes
    u >= W/P pad with the array's own edge-extension? No — with zeros;
    callers needing a specific pad value overwrite it."""
    h, w = x.shape
    wu = w // P
    xt = x.reshape(h, wu, P).transpose(0, 2, 1)
    return jnp.pad(xt, ((0, 0), (0, 0), (0, WS - wu)))


def phase_to_img(x: jax.Array, w: int) -> jax.Array:
    """(H, P, WS) -> (H, W)."""
    h, P = x.shape[0], x.shape[1]
    wu = w // P
    return x[:, :, :wu].transpose(0, 2, 1).reshape(h, w)


def _shift_x(a: jax.Array, d: int, fill) -> jax.Array:
    """Value at column x+d (d in {-1, +1}) of a phase image (h, P, WS);
    out-of-image columns read ``fill`` (callers mask real-width edges)."""
    h, P, _ = a.shape
    if d == 1:
        # slot p reads slot p+1 same u; slot P-1 reads slot 0 at u+1
        wrap = jnp.concatenate(
            [a[:, :1, 1:], jnp.full((h, 1, 1), fill, a.dtype)], axis=2
        )
        return jnp.concatenate([a[:, 1:], wrap], axis=1)
    # d == -1: slot p reads p-1 same u; slot 0 reads slot P-1 at u-1
    wrap = jnp.concatenate(
        [jnp.full((h, 1, 1), fill, a.dtype), a[:, -1:, :-1]], axis=2
    )
    return jnp.concatenate([wrap, a[:, :-1]], axis=1)


def _shift_y(a: jax.Array, d: int, fill) -> jax.Array:
    pad = jnp.full((1,) + a.shape[1:], fill, a.dtype)
    if d == 1:
        return jnp.concatenate([a[1:], pad], axis=0)
    return jnp.concatenate([pad, a[:-1]], axis=0)


def min_pool2_phase(a: jax.Array) -> jax.Array:
    """(h, P, WS) -> (h/2, P/2, WS) 2x2 min (pad lanes must carry +inf-like
    values so they never win)."""
    s = jnp.minimum(a[:, 0::2], a[:, 1::2])  # column pairs: slot pairs
    return jnp.minimum(s[0::2], s[1::2])  # row pairs


def _edge_masks(P: int, wu: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(valid, is_x0, is_xlast) lane masks of shape (1, P, WS)."""
    u = np.arange(WS)[None, None, :]
    p = np.arange(P)[None, :, None]
    valid = np.broadcast_to(u < wu, (1, P, WS))
    is_x0 = np.broadcast_to((u == 0) & (p == 0), (1, P, WS))
    is_xl = np.broadcast_to((u == wu - 1) & (p == P - 1), (1, P, WS))
    return valid, is_x0, is_xl


def laplacian_edge_mask_phase(
    a: jax.Array, w: int, gradient_filter: float
) -> jax.Array:
    """Ordered 9-term Laplacian > threshold; borders False (reference
    project_cloud.cu:55-79; taps/order as ops/prefilter.py)."""
    h, P, _ = a.shape
    wu = w // P
    taps = {
        (-1, 0): 1.0, (0, -1): 1.0, (0, 0): -4.0, (0, 1): 1.0, (1, 0): 1.0,
    }
    s = jnp.zeros_like(a)
    # keep the reference accumulation ORDER (incl. zero-weight taps elided:
    # adding 0.0*x is exact, so skipping them is bit-identical)
    for dy, dx in ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0)):
        nb = a
        if dx:
            nb = _shift_x(nb, dx, jnp.float32(0))
        if dy:
            nb = _shift_y(nb, dy, jnp.float32(0))
        s = s + nb * jnp.float32(taps[(dy, dx)])
    mask = s > jnp.float32(gradient_filter)
    valid, is_x0, is_xl = _edge_masks(P, wu)
    row = jnp.arange(h)[:, None, None]
    interior = (
        jnp.asarray(valid & ~is_x0 & ~is_xl)
        & (row > 0)
        & (row < h - 1)
    )
    return mask & interior


def up2_phase(a: jax.Array) -> jax.Array:
    """(h, P, WS) -> (2h, 2P, WS): fine [y, p, u] = coarse [y//2, p//2, u]
    (fine column x = u*2P + p has parent x//2 = u*P + p//2)."""
    a = jnp.repeat(a, 2, axis=1)
    return jnp.repeat(a, 2, axis=0)


def compare_levels_phase(
    low: jax.Array, high: jax.Array, grad_mask: jax.Array,
    w_low: int, filter_strength: float,
) -> jax.Array:
    """Keep-mask at the fine level (reference compareImgsKernel; the
    3x3 coarse neighborhood max runs at coarse res — see
    ops/prefilter.py:compare_levels for the exactness argument)."""
    fs = jnp.float32(filter_strength)
    P = low.shape[1]
    wu = w_low // P
    valid, is_x0, is_xl = _edge_masks(P, wu)
    neg1 = jnp.float32(-1.0)
    # out-of-image reads are -1.0 (incl. the lane padding)
    lowm = jnp.where(jnp.asarray(valid), low, neg1)
    nbmax = jnp.full(low.shape, neg1)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = lowm
            if dx:
                nb = _shift_x(nb, dx, neg1)
                # the x-wrap crosses the image edge: kill it there
                edge = is_xl if dx == 1 else is_x0
                nb = jnp.where(jnp.asarray(edge), neg1, nb)
            if dy:
                nb = _shift_y(nb, dy, neg1)
            nbmax = jnp.maximum(nbmax, nb)
    threshold = jnp.where(grad_mask, nbmax, low) * fs
    empty = high >= jnp.float32(DEPTH_EMPTY_THRESHOLD)
    return ~empty & (high <= up2_phase(threshold))


def bilinear_up2_phase(low: jax.Array, w_low: int) -> jax.Array:
    """Exact phase-layout replica of ops/prefilter.py:bilinear_up2
    (clamped-index corner reads, weights against the clamped lower index)."""
    hl, P, _ = low.shape
    oh, ow = 2 * hl, 2 * w_low
    wu = w_low // P

    def axis_w(o: int, l: int):
        x = np.arange(o, dtype=np.float64)
        inx = (x + 0.5) / 2.0 - 0.5
        x0c = np.clip(np.floor(inx).astype(np.int64), 0, l - 1)
        return (inx - x0c).astype(np.float32)

    wy = jnp.asarray(axis_w(oh, hl))[:, None, None]
    # per-fine-column weight in phase order: fine x = u*2P + p
    wx_lin = axis_w(ow, w_low)  # (ow,) in column order
    wxp = np.zeros((1, 2 * P, WS), np.float32)
    u = np.arange(ow) // (2 * P)
    p = np.arange(ow) % (2 * P)
    wxp[0, p, u] = wx_lin
    wx = jnp.asarray(wxp)

    A = up2_phase(low)
    P2 = 2 * P
    # up2 doubles SLOTS, not lanes: the fine grid keeps the same per-slot
    # lane count wu (ow / P2 == w_low / P)
    _, is_x0, is_xl = _edge_masks(P2, wu)

    def clamp_shift_x(a, d):
        sh = _shift_x(a, d, jnp.float32(0))
        edge = jnp.asarray(is_x0 if d == -1 else is_xl)
        return jnp.where(edge, a, sh)

    def clamp_shift_y(a, d):
        if d == -1:
            return jnp.concatenate([a[:1], a[:-1]], axis=0)
        return jnp.concatenate([a[1:], a[-1:]], axis=0)

    l00 = clamp_shift_y(clamp_shift_x(A, -1), -1)
    l01 = clamp_shift_y(clamp_shift_x(A, 1), -1)
    l10 = clamp_shift_y(clamp_shift_x(A, -1), 1)
    l11 = clamp_shift_y(clamp_shift_x(A, 1), 1)
    v0 = (1.0 - wx) * l00 + wx * l01
    v1 = (1.0 - wx) * l10 + wx * l11
    return (1.0 - wy) * v0 + wy * v1


@functools.partial(jax.jit, static_argnames=("P", "levels",))
def depth_prefilter_phase(
    depth: jax.Array,
    rgb: jax.Array,
    *,
    P: int,
    levels: int = 4,
    filter_strength: float = 1.025,
    gradient_filter: float = 0.03,
) -> Dict[str, jax.Array]:
    """Full coarse-to-fine prefilter + packing in the phase layout.

    depth: (H, W) f32; rgb: (H, W, 3) uint8 OR (H, W) i32 packed
    r|g<<8|b<<16 (``rasterize_packed``); P: full-res phase count (the
    U-Net's 2^levels). Returns the packed phase U-Net input
    ``unet_input_phase`` (((H+2)*8, P*WS) bf16, channels RGB/mask/depth
    then 3 zero pads) plus the same aux buffers as ops/prefilter.py
    (NHWC — computed lazily from the phase arrays; unused ones DCE away).
    """
    h, w = depth.shape
    assert w % P == 0 and w // P <= WS and h % (1 << levels) == 0
    depth = depth.astype(jnp.float32)

    valid0, _, _ = _edge_masks(P, w // P)
    dp = img_to_phase(depth, P)
    # lane padding carries FLT_MAX so min-pools and the empty test treat it
    # as empty sky
    dp = jnp.where(jnp.asarray(valid0), dp, jnp.float32(DEPTH_EMPTY))

    pyr = [dp]
    a = dp
    for _ in range(levels):
        a = min_pool2_phase(a)
        pyr.append(a)

    mask_fine = None
    for i in range(levels, 0, -1):
        w_i = w >> i
        grad = laplacian_edge_mask_phase(pyr[i], w_i, gradient_filter)
        mask_fine = compare_levels_phase(
            pyr[i], pyr[i - 1], grad, w_i, filter_strength
        )
        if i > 1:
            filled = bilinear_up2_phase(pyr[i], w_i)
            pyr[i - 1] = jnp.where(mask_fine, pyr[i - 1], filled)

    dmin, dmax = depth_min_max(depth)

    keep = mask_fine & jnp.asarray(valid0)
    if rgb.ndim == 2:  # already packed i32
        packed = rgb
    else:
        packed = (
            rgb[:, :, 0].astype(jnp.int32)
            | (rgb[:, :, 1].astype(jnp.int32) << 8)
            | (rgb[:, :, 2].astype(jnp.int32) << 16)
        )
    pp = img_to_phase(packed, P)
    chans = [
        jnp.where(keep, ((pp >> s) & 255).astype(jnp.float32) / 255.0, 0.0)
        for s in (0, 8, 16)
    ]
    chans.append(keep.astype(jnp.float32))
    chans.append(jnp.where(keep, (dp - dmin) / (dmax - dmin), -1.0))
    L = P * WS
    x8 = jnp.stack(
        [c.reshape(h, L) for c in chans]
        + [jnp.zeros((h, L), jnp.float32)] * 3,
        axis=1,
    ).astype(jnp.bfloat16)  # (H, 8, L)
    z = jnp.zeros((8, L), jnp.bfloat16)
    unet_input_phase = jnp.concatenate(
        [z, x8.reshape(h * 8, L), z], axis=0
    )

    out = {
        "unet_input_phase": unet_input_phase,
        "mask_phase": keep,
        "depth_min": dmin,
        "depth_max": dmax,
    }
    # aux NHWC views (exact ops/prefilter.py contract; DCE'd when unused)
    from rtnr_tpu.ops.raster import unpack_rgb8

    rgb_u8 = rgb if rgb.ndim == 3 else unpack_rgb8(rgb)
    keep_img = phase_to_img(keep, w)
    out["mask"] = keep_img
    out["filtered_depth"] = jnp.where(keep_img, depth, jnp.float32(-1.0))
    out["filtered_rgb"] = jnp.where(keep_img[:, :, None], rgb_u8, jnp.uint8(0))
    ch_rgb = jnp.where(
        keep_img[:, :, None], rgb_u8.astype(jnp.float32) / 255.0, 0.0
    )
    ch_depth = jnp.where(keep_img, (depth - dmin) / (dmax - dmin), -1.0)
    out["unet_input"] = jnp.concatenate(
        [ch_rgb, keep_img[:, :, None].astype(jnp.float32),
         ch_depth[:, :, None]], axis=-1,
    )
    return out
