"""Tracing / profiling helpers — first-class observability.

The reference only has wall-clock timers (SURVEY.md §5).  Here: phase
timers that force device completion, and jax.profiler trace capture for
per-op TPU timelines.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class PhaseTimer:
    """Accumulating per-phase wall timers with device sync at boundaries."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            k: {"total_s": self.totals[k], "n": self.counts[k], "mean_s": self.totals[k] / self.counts[k]}
            for k in self.totals
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
