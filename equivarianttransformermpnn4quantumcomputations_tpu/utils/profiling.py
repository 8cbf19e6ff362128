"""Profiling utilities: jax.profiler traces and step-time statistics.

The reference has no tracing at all (SURVEY §5: only tqdm postfixes); here
profiling is first-class: wrap any training loop section in
``trace(run_dir)`` to capture a TensorBoard/XProf trace, and use
``StepTimer`` for lightweight step-time percentiles in the logs.
"""

from __future__ import annotations

import contextlib
import os
import time

import numpy as np

__all__ = ["trace", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace into ``log_dir`` (view with xprof/TB)."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step-time stats; call mark() after each (blocked) step."""

    def __init__(self, window: int = 200):
        self.window = window
        self.times: list[float] = []
        self._last = None

    def mark(self):
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    def stats(self) -> dict:
        if not self.times:
            return {}
        a = np.asarray(self.times)
        return {
            "step_time_mean_s": float(a.mean()),
            "step_time_p50_s": float(np.percentile(a, 50)),
            "step_time_p95_s": float(np.percentile(a, 95)),
            "steps_per_sec": float(1.0 / a.mean()),
        }
