"""Profiling / tracing hooks.

The reference has no profiling at all (SURVEY.md §5). Here: a context
manager around ``jax.profiler`` traces (viewable in TensorBoard /
Perfetto), named trace annotations for the hot phases, and a steps/s meter
used as the north-star throughput harness.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path = "/tmp/jax-trace"):
    """Capture a device trace for the enclosed block."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepsPerSecond:
    """Throughput meter: call ``update(n_steps)`` after each unit of work.

    ``rate()`` gives overall steps/s, ``window_rate()`` the rate since the
    last ``mark()``.
    """

    def __init__(self) -> None:
        self.t0 = time.perf_counter()
        self.total = 0
        self._mark_t = self.t0
        self._mark_total = 0

    def update(self, n_steps: int) -> None:
        self.total += int(n_steps)

    def mark(self) -> None:
        self._mark_t = time.perf_counter()
        self._mark_total = self.total

    def rate(self) -> float:
        dt = time.perf_counter() - self.t0
        return self.total / dt if dt > 0 else 0.0

    def window_rate(self) -> float:
        dt = time.perf_counter() - self._mark_t
        n = self.total - self._mark_total
        return n / dt if dt > 0 else 0.0
