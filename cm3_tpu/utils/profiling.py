"""Tracing / profiling utilities.

The reference's only instrumentation is wall-clock columns in
``log_century.csv`` (``train_offpolicy.py:221,403``) and the env/train
split timers of the on-policy loop (``train_onpolicy.py:304-378``).
Kept here, plus the TPU-native additions the survey calls for
(SURVEY.md §5): ``jax.profiler`` trace capture and steps/sec counters.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    with jax.profiler.TraceAnnotation(name):
        yield


class Throughput:
    """Windowed steps/sec counter."""

    def __init__(self):
        self.t0 = time.time()
        self.units = 0

    def add(self, n: int):
        self.units += n

    def rate(self) -> float:
        dt = time.time() - self.t0
        return self.units / dt if dt > 0 else 0.0

    def reset(self):
        self.t0 = time.time()
        self.units = 0


class SplitTimer:
    """env/train wall-clock split (train_onpolicy.py:304,324,358,378)."""

    def __init__(self):
        self.totals: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.time() - t0

    def summary(self) -> Dict[str, float]:
        return dict(self.totals)
