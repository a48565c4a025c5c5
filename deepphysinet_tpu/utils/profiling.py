"""Tracing / profiling hooks.

The reference's only observability is a wall-clock fps counter
(metric/time_metric.py:8-30).  The TPU-native replacements:

* ``trace`` context manager around training sections -> jax.profiler traces
  viewable in TensorBoard / Perfetto (set ``trace_dir``).
* ``ThroughputMeter`` -- collocation-point residual evals/sec and optimizer
  steps/sec, the framework's headline counters (BASELINE.json metric).
* ``step_annotation`` -- named XLA step markers (StepTraceAnnotation) so traces
  segment per optimizer step.

All hooks are no-ops when profiling is off; nothing touches the hot loop.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


@contextlib.contextmanager
def trace(trace_dir: Optional[str] = None):
    """Capture a jax.profiler trace for the enclosed block (if dir given)."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def step_annotation(name: str, step: int):
    """Named step marker inside a trace; no-op outside tracing."""
    import jax

    return jax.profiler.StepTraceAnnotation(name, step_num=step)


class ThroughputMeter:
    """Sliding-window throughput: points/sec and steps/sec."""

    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._t0 = time.monotonic()
        self._points = 0
        self._steps = 0

    def update(self, n_points: int, n_steps: int = 1) -> None:
        self._points += n_points
        self._steps += n_steps

    @property
    def elapsed(self) -> float:
        return time.monotonic() - self._t0 + 1e-9

    def points_per_sec(self) -> float:
        return self._points / self.elapsed

    def steps_per_sec(self) -> float:
        return self._steps / self.elapsed

    def summary(self) -> dict:
        return {
            "points_per_sec": self.points_per_sec(),
            "steps_per_sec": self.steps_per_sec(),
            "elapsed_s": self.elapsed,
        }
