"""Profiling / tracing utilities (jax.profiler).

The reference has no formal profiler (SURVEY.md §5) — only tqdm/ETA logs.
Here: a trace context manager writing TensorBoard-viewable traces, named
scopes for annotating phases, and a simple step timer that logs
steps/sec + tokens/sec.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax

__all__ = ["trace", "annotate", "StepTimer"]


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: ``with trace('outputs/trace'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope showing up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling steps/sec + items/sec tracker for the training loop."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)
