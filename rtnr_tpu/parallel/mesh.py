"""Device mesh construction helpers.

The reference is strictly single-GPU (SURVEY.md section 2's parallelism
checklist); all scale-out here is new, built on jax.sharding over ICI/DCN.

Axis conventions used across the framework:
- ``"points"``: point-cloud shards (z-buffer merged with pmin, color sums
  with psum) — the scene-scale axis.
- ``"batch"``: trajectory frames (pure data parallelism) — the
  throughput axis, typically mapped across hosts.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Tuple[str, ...] = ("batch", "points"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh over the available devices.

    Default: all devices on the "points" axis, batch=1. Pass e.g.
    ``axis_sizes=(2, 4)`` for 2-way frame batching x 4-way point sharding.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [1] * (len(axis_names) - 1) + [n]
    assert int(np.prod(axis_sizes)) == n, (
        f"mesh {tuple(axis_sizes)} needs {int(np.prod(axis_sizes))} devices, have {n}"
    )
    dev_array = np.asarray(devices).reshape(tuple(axis_sizes))
    return Mesh(dev_array, axis_names)
