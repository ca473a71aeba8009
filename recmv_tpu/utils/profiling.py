"""Tracing / profiling subsystem (SURVEY §5: the reference has none; the
rebuild makes it first-class): jax.profiler trace capture + lightweight
phase timers aggregated per step."""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/perfetto)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimers:
    """Accumulates wall-time per named phase; used around jitted calls
    (block_until_ready for truthful timings when sync=True)."""

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if self.sync and result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def summary(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self.counts[k],
                    "mean_s": round(v / max(self.counts[k], 1), 4)}
                for k, v in sorted(self.totals.items())}

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def annotate(name: str):
    """Named region in profiler traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
