# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tracing / profiling utilities (aux subsystem, SURVEY.md §5).

The reference has only a timing harness; on TPU we add first-class
profiler integration: ``jax.profiler`` trace capture around any callable,
annotated ranges for engine steps, and a simple per-step timeline
recorder for the serving engine.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/conch_tpu_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace annotation context (shows as a range in the timeline)."""
    return jax.profiler.TraceAnnotation(name)


def profile_fn(fn: Callable[..., Any], *args, log_dir: str = "/tmp/conch_tpu_trace", **kwargs) -> Any:
    """Run ``fn`` once under a profiler trace; returns its result."""
    with trace(log_dir):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    return out


@dataclass
class StepTimeline:
    """Lightweight per-step latency recorder for the serving engine."""

    events: list[tuple[str, float, float]] = field(default_factory=list)

    @contextlib.contextmanager
    def record(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.events.append((name, t0, time.perf_counter()))

    def summary(self) -> dict[str, dict[str, float]]:
        """Aggregate stats (count, total_s, mean_ms) per event name."""
        agg: dict[str, list[float]] = {}
        for name, t0, t1 in self.events:
            agg.setdefault(name, []).append(t1 - t0)
        return {
            name: {
                "count": len(times),
                "total_s": sum(times),
                "mean_ms": 1e3 * sum(times) / len(times),
            }
            for name, times in agg.items()
        }
