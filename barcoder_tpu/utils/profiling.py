"""Profiling and performance counters.

The reference's timing surface is limited to "Finished at {now}" table
captions (targets.py:718); here profiling is first-class (SURVEY.md §5):

  - :class:`Phases` — wall-clock per pipeline phase plus derived throughput
    counters (genome-positions-scanned/s, reads-counted/s);
  - :func:`device_trace` — context manager wrapping ``jax.profiler`` so any
    run can emit a TensorBoard-compatible device trace
    (``--profile DIR`` on the CLIs).
"""

from __future__ import annotations

import contextlib
import json
import time
from dataclasses import dataclass, field


@dataclass
class Phases:
    """Accumulates named phase timings and counters."""

    timings: dict = field(default_factory=dict)
    counters: dict = field(default_factory=dict)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.timings[name] = self.timings.get(name, 0.0) + (time.perf_counter() - t0)

    def count(self, name: str, value: float) -> None:
        self.counters[name] = self.counters.get(name, 0) + value

    def rate(self, counter: str, phase: str) -> float | None:
        t = self.timings.get(phase)
        c = self.counters.get(counter)
        if not t or c is None:
            return None
        return c / t

    def summary(self) -> dict:
        out = {"timings_s": dict(self.timings), "counters": dict(self.counters)}
        rates = {}
        if "spacer_positions" in self.counters and "scan" in self.timings:
            rates["spacer_positions_per_s"] = self.rate("spacer_positions", "scan")
        if "reads" in self.counters and "count" in self.timings:
            rates["reads_per_s"] = self.rate("reads", "count")
        out["rates"] = rates
        return out

    def log(self, logger) -> None:
        logger.json(self.summary())


@contextlib.contextmanager
def device_trace(trace_dir: str | None):
    """jax.profiler trace when a directory is given; no-op otherwise."""
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def dump_summary(phases: Phases, path: str) -> None:
    with open(path, "w") as fh:
        json.dump(phases.summary(), fh, indent=2)
