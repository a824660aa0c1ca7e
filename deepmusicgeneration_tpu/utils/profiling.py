"""Tracing and profiling utilities.

The reference has none (SURVEY §5.1: commented-out ``time.time()``
scaffolding only). Here: phase timers with aggregate stats, a context manager
around ``jax.profiler`` device traces, and a throughput meter used by the
training loop and bench.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Optional


class PhaseTimer:
    """Accumulates wall-time per named phase; thread-unsafe by design (one
    per worker)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / max(self.counts[name], 1), 3),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        return json.dumps(self.summary())


@contextlib.contextmanager
def device_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler device trace (view with TensorBoard/XProf)."""
    if not enabled:
        yield
        return
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region that shows up in device traces."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield


@dataclass
class ThroughputMeter:
    """Tokens/sec (or items/sec) with exponential smoothing."""

    alpha: float = 0.1
    rate: float = 0.0
    total: int = 0
    _last: Optional[float] = field(default=None, repr=False)

    def update(self, n: int) -> float:
        now = time.perf_counter()
        if self._last is not None:
            dt = max(now - self._last, 1e-9)
            inst = n / dt
            self.rate = inst if self.rate == 0 else (
                self.alpha * inst + (1 - self.alpha) * self.rate)
        self._last = now
        self.total += n
        return self.rate


def block_and_time(fn, *args, **kwargs):
    """Run fn, block on its outputs, return (result, seconds)."""
    import jax
    t0 = time.perf_counter()
    out = fn(*args, **kwargs)
    jax.block_until_ready(out)
    return out, time.perf_counter() - t0
