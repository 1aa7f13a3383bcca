"""Phase-layout prefilter (ops/prefilter_phase.py): bit-exact against the
NHWC formulation (ops/prefilter.py, itself golden-tested vs the loop
oracle) — masks, packed input, filtered buffers, and the packed phase
U-Net input round-trip."""

import numpy as np
import pytest

import jax.numpy as jnp

from rtnr_tpu.config import DEPTH_EMPTY
from rtnr_tpu.ops.prefilter import depth_prefilter
from rtnr_tpu.ops.prefilter_phase import depth_prefilter_phase, phase_to_img


def scene(h, w, seed, occupancy=0.7):
    rng = np.random.default_rng(seed)
    depth = rng.uniform(1.0, 30.0, (h, w)).astype(np.float32)
    empty = rng.uniform(size=(h, w)) > occupancy
    depth[empty] = DEPTH_EMPTY
    rgb = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    return jnp.asarray(depth), jnp.asarray(rgb)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("h,w,P,levels", [(32, 64, 4, 2), (64, 128, 16, 4)])
def test_prefilter_phase_exact(h, w, P, levels, seed):
    depth, rgb = scene(h, w, seed)
    ref = depth_prefilter(depth, rgb, levels=levels)
    got = depth_prefilter_phase(depth, rgb, P=P, levels=levels)

    np.testing.assert_array_equal(np.asarray(got["mask"]), np.asarray(ref["mask"]))
    np.testing.assert_array_equal(
        np.asarray(got["filtered_depth"]), np.asarray(ref["filtered_depth"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["filtered_rgb"]), np.asarray(ref["filtered_rgb"])
    )
    np.testing.assert_array_equal(
        np.asarray(got["unet_input"]), np.asarray(ref["unet_input"])
    )

    # packed phase output: per-channel rows round-trip to the NHWC pack
    # (bf16: compare with a cast of the reference)
    up = np.asarray(got["unet_input_phase"])
    want = np.asarray(ref["unet_input"].astype(jnp.bfloat16).astype(jnp.float32))
    core = up[8 : (h + 1) * 8].reshape(h, 8, P * 128)
    for c in range(5):
        ch = phase_to_img(jnp.asarray(core[:, c]).reshape(h, P, 128), w)
        np.testing.assert_array_equal(
            np.asarray(ch, np.float32), want[:, :, c]
        )
    assert np.all(up[:8] == 0) and np.all(up[(h + 1) * 8 :] == 0)


def test_prefilter_phase_dense_wall():
    """Foreground wall + leaking background: filter keeps the wall."""
    h, w, P = 32, 64, 4
    depth = np.full((h, w), 5.0, np.float32)
    depth[::2, ::2] = 20.0  # background leaking between foreground pixels
    rgb = np.full((h, w, 3), 128, np.uint8)
    ref = depth_prefilter(jnp.asarray(depth), jnp.asarray(rgb), levels=2)
    got = depth_prefilter_phase(jnp.asarray(depth), jnp.asarray(rgb), P=P, levels=2)
    np.testing.assert_array_equal(np.asarray(got["mask"]), np.asarray(ref["mask"]))
    assert np.asarray(ref["mask"]).mean() > 0.5  # the wall survives
