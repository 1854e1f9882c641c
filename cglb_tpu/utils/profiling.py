"""Profiling hooks: jax.profiler traces + per-phase timers as first-class
(SURVEY.md section 5.1 — the reference has only commented-out torch profiler
hooks at cglb/backend/pytorch/models.py:24,153,171-172 and a StopWatch).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax

__all__ = ["trace", "annotate", "PhaseTimer"]


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (wraps jax.profiler.TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Cumulative wall-clock per phase; device work is synchronized at phase
    end so timings reflect actual execution, not dispatch."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = ["phase                     total_s   calls   mean_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} {t:8.3f}  {c:6d}  {t / c * 1e3:8.2f}")
        return "\n".join(lines)
