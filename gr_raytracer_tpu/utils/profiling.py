"""Profiling / observability helpers.

The reference has log/env_logger + indicatif progress (SURVEY.md §5); the
TPU-side equivalents are jax.profiler traces (view in TensorBoard /
Perfetto) and rays/s accounting in the render driver.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace around a block:
        with profiling.trace("/tmp/gr-trace"):
            render(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Rolling rays/s meter (the indicatif analog for logs)."""

    def __init__(self):
        self.t0 = time.perf_counter()
        self.rays = 0

    def add(self, n: int):
        self.rays += n

    @property
    def rays_per_s(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.rays / dt if dt > 0 else 0.0
