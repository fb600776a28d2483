"""Tracing / profiling utilities.

The reference has no profiling at all (SURVEY.md section 5: "Tracing /
profiling: none"); the TPU rebuild ships:

- ``trace(logdir)``: context manager around ``jax.profiler`` producing
  TensorBoard-compatible device traces;
- ``StepTimer``: lightweight per-phase wall-clock aggregation for the
  trainer (data / host->device / step / checkpoint), printed per epoch;
- ``annotate``: named trace regions (jax.profiler.TraceAnnotation).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(logdir: str | None):
    """Capture a device trace into ``logdir`` (no-op when logdir is falsy)."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accumulates wall-clock per named phase; ``summary()`` resets."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self, reset: bool = True) -> str:
        parts = [
            f"{k}: {self.totals[k]:.2f}s/{self.counts[k]}"
            for k in sorted(self.totals)
        ]
        out = " | ".join(parts)
        if reset:
            self.totals.clear()
            self.counts.clear()
        return out
