"""Profiling / tracing subsystem.

The reference's observability is hand-inserted chrono prints
(project_cloud.cu:490) plus ``-lineinfo`` for nsight (SURVEY.md section 5).
TPU-native equivalents:

- ``annotate(name)``: jax.profiler trace annotations — stages show up
  named in xprof/tensorboard traces.
- ``capture(dir)``: programmatic xprof trace capture around a code block.
- ``StageTimer``: block_until_ready wall timers emitting the same
  four-stage line the reference prints, plus derived throughput counters
  (frames/s, points/s, pixels/s) for the BASELINE metrics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


def annotate(name: str):
    """Named trace span (shows up in xprof): ``with annotate('raster'): ...``"""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def capture(trace_dir: str) -> Iterator[None]:
    """Capture an xprof trace of the enclosed block into ``trace_dir``."""
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock per-stage timing with throughput counters."""

    def __init__(self) -> None:
        self.stages: Dict[str, float] = {}
        self._t0: Optional[float] = None
        self._name: Optional[str] = None

    @contextlib.contextmanager
    def stage(self, name: str, sync=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.stages[name] = self.stages.get(name, 0.0) + (time.perf_counter() - t0) * 1e3

    def line(self) -> str:
        total = sum(self.stages.values())
        parts = ", ".join(f"{k}[{v:.2f}]" for k, v in self.stages.items())
        return f"RENDER_TIME: {parts}, Total[{total:.2f}]"

    def throughput(self, n_points: int, n_pixels: int, n_frames: int = 1) -> Dict[str, float]:
        total_s = sum(self.stages.values()) / 1e3
        if total_s <= 0:
            return {}
        return {
            "fps": n_frames / total_s,
            "points_per_s": n_points * n_frames / total_s,
            "pixels_per_s": n_pixels * n_frames / total_s,
        }
