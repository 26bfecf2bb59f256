"""Profiling and step-timing utilities.

The reference has no tracing/profiling at all (SURVEY.md §5) — only tqdm
bars.  Here: jax.profiler trace capture around training regions plus a
lightweight step timer for throughput accounting (utterances/sec, the
BASELINE.json headline metric).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace into log_dir (no-op when None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock timing with device-sync boundaries and simple stats."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    @property
    def best(self) -> float:
        return min(self.times) if self.times else float("nan")

    def throughput(self, items_per_step: float) -> float:
        return items_per_step / self.mean if self.times else 0.0
