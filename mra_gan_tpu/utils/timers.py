"""Step/data timing + optional JAX profiler traces (the reference only has
wall-clock prints, reference train.py:111-113; the profiler hook is the
TPU-native upgrade)."""
from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Tracks compute and data-wait durations per iteration."""

    def __init__(self):
        self._last = time.perf_counter()
        self.t_data = 0.0
        self.t_comp = 0.0

    def data_ready(self):
        now = time.perf_counter()
        self.t_data = now - self._last
        self._last = now

    def step_done(self):
        now = time.perf_counter()
        self.t_comp = now - self._last
        self._last = now


@contextlib.contextmanager
def profile_trace(logdir: str | None):
    """JAX profiler trace context; no-op when logdir is falsy."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
