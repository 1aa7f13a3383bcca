"""Depth-based background-leak prefilter + 5-channel U-Net input packing.

Reproduces the heuristic of reference src/RTRenderer/src/project_cloud.cu:

1. ``reduce`` (project_cloud.cu:28-53): a min-depth pyramid, 2x2 min per
   level, ``depthRescaleDepth = 4`` levels.
2. ``laplacianKernel`` (:55-79): 3x3 Laplacian {0,1,0;1,-4,1;0,1,0} on each
   coarse level, thresholded at ``gradientFilter = 0.03`` -> binary edge
   mask; image borders always 0.
3. ``compareImgsKernel`` (:88-126): a fine pixel survives iff its depth is
   <= ``filterStrength = 1.025`` x a coarse min-depth — tested against the
   3x3 coarse neighborhood when the co-located coarse pixel is on a gradient
   edge, else only against the co-located coarse pixel. Out-of-bounds coarse
   neighbors read as -1.0; fine pixels at/above MAX_FLOAT are empty.
4. ``resizeKernel`` (:128-161): on non-final levels, bilinearly refills
   *rejected* fine pixels from the coarse level — mutating the next-finer
   pyramid level *before* it is compared (the coarse-to-fine loop order of
   project_cloud.cu:352-391 is semantically load-bearing and kept here).
5. ``removeMask`` (:163-187): zero color+depth of rejected pixels and pack
   the 5-channel U-Net input: ch0-2 RGB/255, ch3 mask in {0,1}, ch4 depth
   normalized by the global (min,max) over occupied pixels, -1 where empty.

TPU-native formulation: every kernel is a vectorized whole-image op (pads,
shifts, 4-gather bilinear). The level loop is a Python loop over a static
level count, so XLA sees one straight-line fused program.

Shape contract: H and W must be divisible by 2**levels. (At non-divisible
sizes the reference silently truncates odd levels and leaves bottom rows of
the packed tensor uninitialized — see applyDepthFilter's ``newWidth /= 2``
/ ``*= 2`` round trip at project_cloud.cu:340-362; we require padding
instead, see ``rtnr_tpu.pipeline.pad_to_pyramid``.)

Exact-arithmetic notes (deliberately mirrored, all float32):
- The Laplacian accumulates all nine products in kernel order, so
  FLT_MAX-saturated neighborhoods produce the same inf/NaN-driven mask
  decisions as the CUDA code.
- ``resizeKernel``'s bilinear weights are computed against the *clamped*
  lower neighbor index, so border pixels extrapolate with negative weights
  exactly like the reference (project_cloud.cu:144-160).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rtnr_tpu.config import DEPTH_EMPTY, DEPTH_EMPTY_THRESHOLD
from rtnr_tpu.ops.raster import depth_min_max

_LAPLACE_TAPS: Tuple[Tuple[int, int, float], ...] = (
    (-1, -1, 0.0),
    (-1, 0, 1.0),
    (-1, 1, 0.0),
    (0, -1, 1.0),
    (0, 0, -4.0),
    (0, 1, 1.0),
    (1, -1, 0.0),
    (1, 0, 1.0),
    (1, 1, 0.0),
)


def min_pool2(x: jax.Array) -> jax.Array:
    """One 2x2-min pyramid level (reference ``reduce``, project_cloud.cu:28-53)."""
    h, w = x.shape
    return x[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2).min(axis=(1, 3))


def laplacian_edge_mask(
    x: jax.Array, gradient_filter: float, g0=None, h_tot: int = 0
) -> jax.Array:
    """Binary edge mask: ordered 9-term Laplacian > threshold; borders False.

    Keeps the reference's sequential float32 accumulation (including the
    zero-weight taps) so saturated values overflow/NaN identically
    (project_cloud.cu:66-77).

    ``g0``/``h_tot`` (strip mode, parallel/tiles.py): ``x`` is a
    halo-extended row strip of a ``h_tot``-row image whose local row 0 sits
    at global row ``g0`` (a traced scalar, possibly negative); the
    border-row mask then tests GLOBAL row coordinates so a strip computes
    exactly what the full image would at its rows.
    """
    h, w = x.shape
    s = jnp.zeros_like(x)
    for dy, dx, tap in _LAPLACE_TAPS:
        nb = jnp.roll(x, (-dy, -dx), axis=(0, 1))
        s = s + nb * jnp.float32(tap)
    mask = s > jnp.float32(gradient_filter)
    row = jnp.arange(h)[:, None]
    col = jnp.arange(w)[None, :]
    if g0 is None:
        row_int = (row > 0) & (row < h - 1)
    else:
        grow = row + g0
        row_int = (grow > 0) & (grow < h_tot - 1)
    interior = row_int & (col > 0) & (col < w - 1)
    return mask & interior


def compare_levels(
    low: jax.Array, high: jax.Array, grad_mask: jax.Array,
    filter_strength: float, g0=None, h_tot: int = 0,
) -> jax.Array:
    """Keep-mask for the fine level (reference compareImgsKernel,
    project_cloud.cu:88-126). True = pixel survives.

    ``g0``/``h_tot``: strip mode (see laplacian_edge_mask) — coarse
    neighbor reads beyond the GLOBAL image rows are -1.0 even where the
    strip has (halo) data locally."""
    fs = jnp.float32(filter_strength)
    empty = high >= jnp.float32(DEPTH_EMPTY_THRESHOLD)

    def up2(a: jax.Array) -> jax.Array:
        return jnp.repeat(jnp.repeat(a, 2, axis=0), 2, axis=1)

    low_pad = jnp.pad(low, 1, constant_values=np.float32(-1.0))
    lh, lw = low.shape
    # Each fine pixel compares its own depth against the 3x3 coarse
    # neighborhood of its parent cell (out-of-bounds coarse reads are -1.0,
    # reference getPixelValue, project_cloud.cu:81-86). The reference ORs
    # nine per-neighbor tests cv <= nb*fs; with fs > 0 that is EXACTLY
    # cv <= fs * max3x3(nb) (comparison against a scalar multiple is
    # monotone and fs*max is the same float as the max of the products for
    # the selected element), so the neighborhood reduction runs at COARSE
    # resolution — one fine-res compare instead of nine.
    row = jnp.arange(lh)[:, None]
    nbmax = jnp.full(low.shape, np.float32(-1.0))
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            nb = low_pad[1 + dy : 1 + dy + lh, 1 + dx : 1 + dx + lw]
            if g0 is not None and dy != 0:
                gnb = row + g0 + dy
                nb = jnp.where((gnb >= 0) & (gnb < h_tot), nb, np.float32(-1.0))
            nbmax = jnp.maximum(nbmax, nb)
    cv = high
    threshold = jnp.where(grad_mask, nbmax, low) * fs
    keep = cv <= up2(threshold)
    return ~empty & keep


def bilinear_up2(
    low: jax.Array, out_shape: Tuple[int, int], g0=None, h_tot: int = 0
) -> jax.Array:
    """Exact replica of the reference resizeKernel interpolation
    (project_cloud.cu:136-160): half-pixel centers, indices clamped, weights
    against the clamped lower index (border extrapolation included).

    Gather-free formulation (gathers serialize on TPU): with out == 2*low
    the clamped tap indices are exactly the clamped +-1 row/col shifts of
    the 2x-repeated image A[y, x] = low[y//2, x//2]:
        low[y0c[y], x0c[x]] == A[max(y-1, 0), max(x-1, 0)]
        low[y1c[y], x1c[x]] == A[min(y+1, 2h-1), min(x+1, 2w-1)]
    so the four corner reads are edge-clamped shifts of A — pure
    slicing/concat, fully fusable. Weights keep the original construction
    (identical f32 values), so results are bit-identical.
    """
    oh, ow = out_shape
    lh, lw = low.shape
    assert (oh, ow) == (2 * lh, 2 * lw), "bilinear_up2 requires exact 2x upsampling"

    def axis_w(o: int, l: int):
        x = np.arange(o, dtype=np.float64)
        inx = (x + 0.5) / 2.0 - 0.5
        x0c = np.clip(np.floor(inx).astype(np.int64), 0, l - 1)
        return (inx - x0c).astype(np.float32)

    if g0 is None:
        wy = jnp.asarray(axis_w(oh, lh))[:, None]
    else:
        # global fine-row weights: the alternating 0.25/0.75 pattern is
        # parity-preserving (strip offsets are even multiples), only the
        # global row 0 extrapolates with weight -0.25; the bottom border is
        # handled by the clamped shifts, not the weights
        base = np.where(np.arange(oh) % 2 == 0, 0.75, 0.25).astype(np.float32)
        gy = jnp.arange(oh) + 2 * g0
        wy = jnp.where(gy == 0, np.float32(-0.25), jnp.asarray(base))[:, None]
    wx = jnp.asarray(axis_w(ow, lw))[None, :]

    A = jnp.repeat(jnp.repeat(low, 2, axis=0), 2, axis=1)
    dn = lambda M: jnp.concatenate([M[:1], M[:-1]], axis=0)  # row y -> y-1, clamped
    up = lambda M: jnp.concatenate([M[1:], M[-1:]], axis=0)  # row y -> y+1, clamped
    lf = lambda M: jnp.concatenate([M[:, :1], M[:, :-1]], axis=1)
    rt = lambda M: jnp.concatenate([M[:, 1:], M[:, -1:]], axis=1)
    if g0 is not None:
        # row clamps must happen at the GLOBAL image borders (full-image
        # reads row max(y-1,0) / min(y+1,oh_tot-1)); interior strips have
        # the true neighbor rows in their halo
        gyc = (jnp.arange(oh) + 2 * g0)[:, None]
        oh_tot = 2 * h_tot
        dn_l, up_l = dn, up
        dn = lambda M: jnp.where(gyc == 0, M, dn_l(M))
        up = lambda M: jnp.where(gyc == oh_tot - 1, M, up_l(M))

    l00 = dn(lf(A))
    l01 = dn(rt(A))
    l10 = up(lf(A))
    l11 = up(rt(A))
    v0 = (1.0 - wx) * l00 + wx * l01
    v1 = (1.0 - wx) * l10 + wx * l11
    return (1.0 - wy) * v0 + wy * v1


@functools.partial(jax.jit, static_argnames=("levels", "total_h"))
def depth_prefilter(
    depth: jax.Array,
    rgb: jax.Array,
    *,
    levels: int = 4,
    filter_strength: float = 1.025,
    gradient_filter: float = 0.03,
    row_offset=None,
    total_h: int = 0,
    minmax: Optional[Tuple[jax.Array, jax.Array]] = None,
) -> Dict[str, jax.Array]:
    """Full coarse-to-fine prefilter + packing.

    depth: (H, W) float32 z-buffer (FLT_MAX = empty); rgb: (H, W, 3) uint8.

    Returns dict:
      unet_input:     (H, W, 5) float32 (NHWC channel order; the reference
                      packs NCHW half — content identical per channel)
      filtered_depth: (H, W) float32 (-1 at rejected pixels, as removeMask
                      leaves the depth buffer, project_cloud.cu:170)
      filtered_rgb:   (H, W, 3) uint8 (0 at rejected pixels)
      mask:           (H, W) bool keep-mask
      depth_min/max:  global scalars used for normalization

    Strip mode (``row_offset``/``total_h``, used by parallel/tiles.py):
    ``depth`` is a halo-extended row strip of a ``total_h``-row image whose
    local row 0 sits at global row ``row_offset`` (traced scalar, negative
    for the first strip's fake top halo; must be a multiple of 2**levels so
    pyramid cells align). All border-dependent decisions (Laplacian border
    rows, out-of-image coarse reads, bilinear clamps/weights) then follow
    GLOBAL row coordinates, so a strip's rows away from the extension
    borders are bit-identical to the full-image computation. ``minmax``
    supplies the global (dmin, dmax) (a cross-strip reduction).
    """
    h, w = depth.shape
    assert h % (1 << levels) == 0 and w % (1 << levels) == 0, (
        f"prefilter needs H, W divisible by {1 << levels}; got {h}x{w} "
        "(use rtnr_tpu.pipeline.pad_to_pyramid)"
    )
    depth = depth.astype(jnp.float32)

    pyr: List[jax.Array] = [depth]
    for _ in range(levels):
        pyr.append(min_pool2(pyr[-1]))

    def level_off(i: int):
        if row_offset is None:
            return None
        # arithmetic shift: exact for negative offsets divisible by 2**i
        return jnp.asarray(row_offset, jnp.int32) >> i

    mask_fine = None
    for i in range(levels, 0, -1):
        g0 = level_off(i)
        h_l = total_h >> i
        grad = laplacian_edge_mask(pyr[i], gradient_filter, g0, h_l)
        mask_fine = compare_levels(
            pyr[i], pyr[i - 1], grad, filter_strength, g0, h_l
        )
        if i > 1:
            filled = bilinear_up2(pyr[i], pyr[i - 1].shape, g0, h_l)
            pyr[i - 1] = jnp.where(mask_fine, pyr[i - 1], filled)

    dmin, dmax = depth_min_max(depth) if minmax is None else minmax

    keep = mask_fine
    rgb_f = rgb.astype(jnp.float32)
    ch_rgb = jnp.where(keep[:, :, None], rgb_f / 255.0, 0.0)
    ch_mask = keep.astype(jnp.float32)
    ch_depth = jnp.where(keep, (depth - dmin) / (dmax - dmin), -1.0)
    unet_input = jnp.concatenate(
        [ch_rgb, ch_mask[:, :, None], ch_depth[:, :, None]], axis=-1
    )

    filtered_depth = jnp.where(keep, depth, jnp.float32(-1.0))
    filtered_rgb = jnp.where(keep[:, :, None], rgb, jnp.uint8(0))
    return {
        "unet_input": unet_input,
        "filtered_depth": filtered_depth,
        "filtered_rgb": filtered_rgb,
        "mask": keep,
        "depth_min": dmin,
        "depth_max": dmax,
    }
