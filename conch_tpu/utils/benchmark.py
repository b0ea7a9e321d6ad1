# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Microbenchmark timing harness.

TPU-native equivalent of the reference's ``conch/utils/benchmark.py:82-112``
(which wraps ``triton.testing.do_bench``): times a JAX callable with
``jax.block_until_ready`` fences, reporting min/max/mean/median over many
iterations with the same CSV schema as the reference.
"""

from __future__ import annotations

import statistics
import time
from dataclasses import dataclass, field
from typing import Any, Callable

import jax


@dataclass
class BenchmarkResult:
    """Timing statistics for one benchmarked callable (milliseconds)."""

    tag: str
    min_ms: float
    max_ms: float
    mean_ms: float
    median_ms: float
    num_iterations: int
    metadata: dict[str, Any] = field(default_factory=dict)

    @staticmethod
    def csv_header() -> str:
        return "tag,min_ms,max_ms,mean_ms,median_ms,num_iterations"

    def csv_row(self) -> str:
        return (
            f"{self.tag},{self.min_ms:.6f},{self.max_ms:.6f},"
            f"{self.mean_ms:.6f},{self.median_ms:.6f},{self.num_iterations}"
        )

    def pretty(self) -> str:
        return (
            f"{self.tag}: median={self.median_ms:.4f}ms mean={self.mean_ms:.4f}ms "
            f"min={self.min_ms:.4f}ms max={self.max_ms:.4f}ms (n={self.num_iterations})"
        )


def benchmark_it(
    fn: Callable[[], Any],
    tag: str = "",
    *,
    warmup_iterations: int = 5,
    num_iterations: int = 100,
    max_time_s: float = 10.0,
    metadata: dict[str, Any] | None = None,
) -> BenchmarkResult:
    """Benchmark ``fn`` and return timing statistics.

    ``fn`` should be a zero-arg callable returning JAX arrays (typically a
    jitted function closed over its inputs). Compilation happens during
    warmup; each timed iteration fences with ``block_until_ready``.
    """
    for _ in range(warmup_iterations):
        jax.block_until_ready(fn())

    times_ms: list[float] = []
    t_total = time.perf_counter()
    for _ in range(num_iterations):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times_ms.append((time.perf_counter() - t0) * 1e3)
        if time.perf_counter() - t_total > max_time_s:
            break

    return BenchmarkResult(
        tag=tag,
        min_ms=min(times_ms),
        max_ms=max(times_ms),
        mean_ms=statistics.fmean(times_ms),
        median_ms=statistics.median(times_ms),
        num_iterations=len(times_ms),
        metadata=metadata or {},
    )


def calibrate_hbm_bw(nominal: float = float("inf"), trials: int = 3) -> float:
    """Measure this chip's achievable GEMV bandwidth (a 64MB weight sweep).

    Tunneled/virtualized dev chips deliver a *fluctuating* fraction of
    nominal HBM bandwidth; benchmark tables should record the calibrated
    number taken at the same moment so results are interpretable as a
    fraction of what the chip could actually do. Takes the best of
    ``trials`` sweeps (the chip's ceiling in this window).
    """
    import jax.numpy as jnp

    try:
        w = jnp.ones((4096, 8192), jnp.bfloat16)  # 64 MB
        x0 = jnp.ones((8, 4096), jnp.bfloat16)

        @jax.jit
        def sweep(x):
            def body(i, x):
                y = jnp.dot(x, w, preferred_element_type=jnp.float32)
                return (y[:, :4096] * 1e-6 + x).astype(jnp.bfloat16)

            return jax.lax.fori_loop(0, 30, body, x)

        jax.block_until_ready(sweep(x0))
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            jax.block_until_ready(sweep(x0))
            best = min(best, (time.perf_counter() - t0) / 30)
        return min((4096 * 8192 * 2) / best, nominal)
    except Exception:
        return nominal
