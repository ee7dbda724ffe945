"""Tracing / profiling — a first-class module the reference lacks
(SURVEY.md section 5: closest artifacts were tqdm bars and print timers).

- ``trace(logdir)``: jax.profiler trace context (view in TensorBoard /
  xprof); captures XLA op timelines on TPU.
- ``Timer`` / ``timed``: lightweight host-side phase timers with
  block_until_ready so device work is actually measured.
- ``annotate``: named profiler regions visible in the trace.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

__all__ = ["trace", "annotate", "Timer", "timed"]


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region in the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating phase timer: Timer.phase('train') as context manager."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync: Optional[object] = None):
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
        lines = []
        for name, tot in sorted(self.totals.items()):
            n = self.counts[name]
            lines.append(f"{name:24s} total {tot:9.3f}s  n={n:5d}  "
                         f"avg {tot / n * 1e3:9.3f}ms")
        return "\n".join(lines)


@contextlib.contextmanager
def timed(name: str, log=print):
    t0 = time.perf_counter()
    yield
    log(f"{name}: {time.perf_counter() - t0:.3f}s")
