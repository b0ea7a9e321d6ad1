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

    @property
    def achieved_gbps(self) -> float | None:
        """Achieved bandwidth from the declared bytes-moved accounting.

        The sanity anchor for every table row: a row whose implied GB/s
        exceeds the same-window calibrated bandwidth is a measurement
        bug, not a fast kernel.
        """
        nbytes = self.metadata.get("bytes_moved")
        if not nbytes or self.median_ms <= 0:
            return None
        return nbytes / (self.median_ms / 1e3) / 1e9

    @staticmethod
    def csv_header() -> str:
        return "tag,min_ms,max_ms,mean_ms,median_ms,num_iterations,achieved_gbps"

    def csv_row(self) -> str:
        gbps = self.achieved_gbps
        return (
            f"{self.tag},{self.min_ms:.6f},{self.max_ms:.6f},"
            f"{self.mean_ms:.6f},{self.median_ms:.6f},{self.num_iterations},"
            f"{'' if gbps is None else f'{gbps:.1f}'}"
        )

    def pretty(self) -> str:
        gbps = self.achieved_gbps
        extra = "" if gbps is None else f" achieved={gbps:.1f}GB/s"
        if self.metadata.get("over_window"):
            extra += f" [OVER-WINDOW: >{self.metadata.get('window_gbps')}GB/s calibrated — measurement suspect]"
        if self.metadata.get("unstable"):
            extra += " [UNSTABLE: diff samples did not converge]"
        return (
            f"{self.tag}: median={self.median_ms:.4f}ms mean={self.mean_ms:.4f}ms "
            f"min={self.min_ms:.4f}ms max={self.max_ms:.4f}ms (n={self.num_iterations}){extra}"
        )


def record_measurements(
    results: list["BenchmarkResult"],
    calibration_gbps: float | None = None,
    path: str | None = None,
) -> None:
    """Append results to the persistent cross-window measurement ledger.

    The tunneled dev chip's delivered bandwidth swings ~2x between
    windows; a single row can therefore contradict an earlier row without
    either being "wrong". The ledger keeps every measurement with its
    timestamp and same-window calibration so
    ``tools/check_window_consistency.py`` can detect inter-window
    contradictions (same tag, >1.5x calibration-normalized spread) —
    the [UNSTABLE] flag only catches *intra*-window noise. Best-effort:
    IO errors never fail a benchmark run. Set ``CONCH_BENCH_LEDGER`` to
    override the path, or to "" to disable.
    """
    import json
    import os
    import pathlib

    env = os.environ.get("CONCH_BENCH_LEDGER")
    if env == "":
        return
    if path is None:
        path = env or str(
            pathlib.Path(__file__).resolve().parents[2] / "tools" / "drive" / "logs" / "measurements.jsonl"
        )
    try:
        device = jax.devices()[0].device_kind
    except Exception:
        device = "unknown"
    # Stamp the code version: a "contradiction" between two windows is
    # only a measurement problem when the code was the same — before/after
    # a kernel fix, a 2x spread is the *point* (e.g. the r5 fp8 bit-algebra
    # dequant moved 70 -> 196 GB/s; the checker groups by (tag, git)).
    try:
        import subprocess

        git = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=5,
            cwd=pathlib.Path(__file__).resolve().parents[2],
        ).stdout.strip() or None
    except Exception:
        git = None
    ts = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    try:
        pathlib.Path(path).parent.mkdir(parents=True, exist_ok=True)
        with open(path, "a") as f:
            for r in results:
                f.write(
                    json.dumps(
                        {
                            "ts": ts,
                            "tag": r.tag,
                            "median_ms": r.median_ms,
                            "min_ms": r.min_ms,
                            "max_ms": r.max_ms,
                            "n": r.num_iterations,
                            "achieved_gbps": r.achieved_gbps,
                            "calibration_gbps": calibration_gbps,
                            "device": device,
                            "git": git,
                            "unstable": bool(r.metadata.get("unstable")),
                            "over_window": bool(r.metadata.get("over_window")),
                        }
                    )
                    + "\n"
                )
    except OSError:
        pass


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


def collect_diff_samples(
    time_pair: Callable[[], float],
    *,
    min_good: int = 3,
    max_tries: int = 12,
    rel_spread: float = 0.20,
) -> tuple[list[float], bool]:
    """Collect loop-difference samples until they are trustworthy.

    ``time_pair`` returns one per-iteration time estimate (seconds) from a
    differenced (N, 2N) loop pair. A single pair can be garbage on a
    tunneled device — window hiccups during the short run produce negative
    or wildly inflated differences — so a number is only publishable when
    several independent pairs agree:

    - negative samples are DISCARDED and re-measured (a negative time is
      always a measurement failure, never a fast kernel);
    - sampling continues until ``min_good`` positive samples lie within
      ``rel_spread`` of their median, or ``max_tries`` pairs are spent.

    Returns ``(samples, consistent)``: the agreeing cluster (or whatever
    positive samples were collected) and whether the consistency bar was
    met. Callers must mark results with ``consistent=False`` as unstable
    rather than publishing them as clean rows.
    """
    good: list[float] = []
    for _ in range(max_tries):
        d = time_pair()
        if d > 0:
            good.append(d)
        if len(good) >= min_good:
            med = statistics.median(good)
            close = [g for g in good if abs(g - med) <= rel_spread * med]
            if len(close) >= min_good:
                return close, True
    return good, False


def benchmark_loop(
    step_fn: Callable[..., Any],
    tag: str = "",
    *,
    operands: tuple = (),
    rotated_operands: tuple = (),
    state: Any | None = None,
    iters_per_dispatch: int = 20,
    reps: int = 5,
    bytes_moved: int | None = None,
    window_gbps: float | None = None,
    metadata: dict[str, Any] | None = None,
    pass_index: bool = False,
) -> BenchmarkResult:
    """Time ``iters_per_dispatch`` chained invocations under ONE dispatch.

    The trustworthy-timing primitive for tunneled/virtualized devices:
    single-dispatch wall timings can be distorted by host round trips and
    early-returning fences, but a ``fori_loop`` of N serialized kernel
    calls divides all of that by N. ``step_fn`` receives a traced f32
    scalar carry (fold it into an input, e.g. ``q + carry``: carry is 0.0 at runtime, so XLA
    can neither reorder nor elide iterations) followed by ``operands``;
    the loop feeds the first element of each output back into the carry.
    Pass large arrays via ``operands``, not closure: closure constants
    are embedded in the compile payload (the tunneled remote compiler
    rejects GB-sized programs).

    Per-iteration time comes from *differencing* two loop sizes (N and
    2N): ``t = (T(2N) - T(N)) / N``. This cancels every fixed cost —
    dispatch, host sync, and (on tunneled devices) the tens of ms of
    round-trip latency that ``block_until_ready`` may or may not include.
    Completion is forced by fetching the scalar loop carry to the host,
    which no async runtime can fake.

    With ``state``, ops that *update* buffers (KV-cache writes, block
    copies) measure honestly: the state pytree rides the loop carry, so
    ``step_fn(carry, state, *operands) -> new_state`` mutates it in place
    across iterations (XLA keeps loop-carried buffers resident) instead of
    re-copying a loop-invariant input every step.

    Every published sample passes :func:`collect_diff_samples`: negative
    differences are re-measured, and the row is only clean when >= 3
    positive samples agree within 20% of their median; otherwise the
    result carries ``metadata["unstable"] = True``. When ``window_gbps``
    (the same-window calibrated bandwidth) is given, a row implying more
    than 1.0x that bandwidth is flagged ``metadata["over_window"] = True``
    — physically impossible rows must never be quoted as fast kernels.

    ``rotated_operands`` defeats the other way loop timing can lie: a
    loop-INVARIANT weight gets hoisted into VMEM once, so marginal
    iterations measure compute-only bandwidth the serving path never sees
    (round-2 tables published 9890 GB/s rows this way; re-confirmed on
    round-4 hardware — a fixed-operand invariant pallas copy measured an
    impossible 11882 GB/s, tools/drive/logs/exp_harness_r4.log). Each
    rotated operand is an array with a leading buffer dimension L >= 2
    (total bytes ideally > VMEM); iteration ``i`` dynamically slices
    buffer ``i % L`` and passes it to ``step_fn`` after the plain
    operands, so consecutive iterations touch different HBM and residency
    is impossible. CAVEAT: XLA may MATERIALIZE the slice before an opaque
    pallas_call (measured 816 -> 201 GB/s on the lm_head GEMM,
    exp_lmhead_r4b.log), so rotated rows are conservative LOWER bounds.
    For ops with a native layer/buffer index (the stacked scalar-prefetch
    GEMM), prefer ``pass_index``: step_fn is then called
    ``step_fn(carry, i, *operands)`` with the loop counter, and can
    rotate zero-copy by indexing inside the kernel.

    Reports the per-iteration milliseconds over ``reps`` differenced pairs.
    """
    import numpy as np

    import jax.numpy as jnp

    def make_run(n):
        @jax.jit
        def run(eps, st, ops, rops):
            def body(i, c):
                carry, s = c
                rslices = tuple(
                    jax.lax.dynamic_index_in_dim(r, i % r.shape[0], keepdims=False)
                    for r in rops
                )
                args = (*ops, *rslices)
                if pass_index:
                    args = (i, *args)
                out = step_fn(carry, s, *args) if state is not None else step_fn(carry, *args)
                leaf = jax.tree_util.tree_leaves(out)[0]
                new_s = out if state is not None else s
                return (carry + eps * jnp.ravel(leaf)[0].astype(jnp.float32), new_s)

            final = jax.lax.fori_loop(0, n, body, (jnp.zeros((), jnp.float32), st))
            return final[0]

        return run

    operands = (operands, tuple(rotated_operands))
    n = iters_per_dispatch
    run_n, run_2n = make_run(n), make_run(2 * n)
    zero = jnp.float32(0.0)
    float(np.asarray(run_n(zero, state, *operands)))  # compile + full sync
    float(np.asarray(run_2n(zero, state, *operands)))

    # Auto-scale the loop so N iterations dwarf the per-dispatch noise:
    # for microsecond-scale ops, T(2N) - T(N) at small N is smaller than
    # the tunnel's round-trip jitter and the difference estimator returns
    # garbage (even <= 0). Estimate per-iteration time from a warmup pair
    # and grow N until the differenced work is ~30 ms.
    t0 = time.perf_counter()
    float(np.asarray(run_n(zero, state, *operands)))
    warm_n = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(np.asarray(run_2n(zero, state, *operands)))
    warm_2n = time.perf_counter() - t0
    per_iter_est = max((warm_2n - warm_n) / n, 1e-7)
    target_n = int(min(max(n, 0.030 / per_iter_est), 20000))
    if target_n > 4 * n:
        n = target_n
        run_n, run_2n = make_run(n), make_run(2 * n)
        float(np.asarray(run_n(zero, state, *operands)))
        float(np.asarray(run_2n(zero, state, *operands)))

    def time_pair() -> float:
        t0 = time.perf_counter()
        float(np.asarray(run_n(zero, state, *operands)))
        t_n = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(np.asarray(run_2n(zero, state, *operands)))
        t_2n = time.perf_counter() - t0
        return (t_2n - t_n) / n

    # The median over agreeing samples is the reported statistic;
    # min-of-diffs would be biased low (a window hiccup during t_n fakes
    # speed), and any negative sample is a measurement failure.
    samples, consistent = collect_diff_samples(
        time_pair, min_good=max(reps, 3), max_tries=max(4 * reps, 12)
    )
    if not samples:
        # Every pair came out negative: fall back to the (never-negative)
        # total time of the long run as an upper bound and flag it.
        t0 = time.perf_counter()
        float(np.asarray(run_2n(zero, state, *operands)))
        samples = [(time.perf_counter() - t0) / (2 * n)]
        consistent = False
    times_ms = [s * 1e3 for s in samples]

    meta = dict(metadata or {})
    if bytes_moved is not None:
        meta["bytes_moved"] = bytes_moved
    meta["iters_per_dispatch"] = n
    if not consistent:
        meta["unstable"] = True
    result = BenchmarkResult(
        tag=tag,
        min_ms=min(times_ms),
        max_ms=max(times_ms),
        mean_ms=statistics.fmean(times_ms),
        median_ms=statistics.median(times_ms),
        num_iterations=len(samples) * n,
        metadata=meta,
    )
    if window_gbps is not None:
        meta["window_gbps"] = round(window_gbps, 1)
        gbps = result.achieved_gbps
        if gbps is not None and gbps > window_gbps:
            meta["over_window"] = True
    return result


def robust_diff_time(
    run_n: Callable[[], Any],
    run_2n: Callable[[], Any],
    n: int,
    *,
    reps: int = 3,
) -> tuple[float, bool]:
    """Per-iteration seconds from differenced (N, 2N) runs, made trustworthy.

    ``run_n``/``run_2n`` are zero-arg callables that fully synchronize
    (fetch a value to the host). Applies the :func:`collect_diff_samples`
    contract — negative differences re-measured, >=3 agreeing samples
    required — and returns ``(seconds_per_iter, consistent)``. Drive/
    experiment scripts must print an ``[unstable]`` marker when
    ``consistent`` is False instead of publishing the number as clean.
    """

    def time_pair() -> float:
        t0 = time.perf_counter()
        run_n()
        t1 = time.perf_counter()
        run_2n()
        t2 = time.perf_counter()
        return ((t2 - t1) - (t1 - t0)) / n

    samples, ok = collect_diff_samples(
        time_pair, min_good=max(reps, 3), max_tries=max(4 * reps, 12)
    )
    if not samples:
        t0 = time.perf_counter()
        run_2n()
        return (time.perf_counter() - t0) / (2 * n), False
    return statistics.median(samples), ok


def calibrate_hbm_bw(nominal: float = float("inf"), trials: int = 3) -> float:
    """Measure this chip's achievable HBM read bandwidth in this window.

    Tunneled/virtualized dev chips deliver a *fluctuating* fraction of
    nominal HBM bandwidth; benchmark tables should record the calibrated
    number taken at the same moment so results are interpretable as a
    fraction of what the chip could actually do. Two probes, best of
    ``trials`` each, max wins:

    - GEMV sweep (64MB weight, decode-like access pattern),
    - streaming reduction over a 256MB array (pure sequential reads —
      closest to a long-context KV scan, and consistently the higher
      of the two).
    """
    import numpy as np

    import jax.numpy as jnp

    def diff_time(make_run, operands, n):
        """Per-iter seconds by differencing loops of n and 2n iterations
        with host value-fetch sync (block_until_ready is unreliable on
        tunneled platforms — both early returns and inflated waits)."""
        run_n, run_2n = make_run(n), make_run(2 * n)
        zero = jnp.float32(0.0)
        float(np.asarray(run_n(zero, *operands)))
        float(np.asarray(run_2n(zero, *operands)))

        def time_pair() -> float:
            t0 = time.perf_counter()
            float(np.asarray(run_n(zero, *operands)))
            t_n = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(np.asarray(run_2n(zero, *operands)))
            t_2n = time.perf_counter() - t0
            return (t_2n - t_n) / n

        # Median of an agreeing cluster, not min: a difference estimator's
        # minimum is biased low (one window hiccup during the short run
        # fakes a huge bandwidth), and negatives are re-measured.
        samples, _ = collect_diff_samples(
            time_pair, min_good=max(trials, 3), max_tries=max(4 * trials, 12)
        )
        if not samples:
            return float("inf")  # calibration failed; caller falls back
        return statistics.median(samples)

    # Any result beyond this is a failed probe (no v5-class chip streams
    # 2 TB/s from HBM), not a fast chip: discard it.
    plausible = 2e12

    try:
        w = jnp.ones((8192, 16384), jnp.bfloat16)  # 256 MB: diff >> tunnel noise
        x0 = jnp.ones((8, 8192), jnp.bfloat16)

        def make_gemv(n):
            @jax.jit
            def run(eps, w, x0):
                def body(i, carry):
                    y = jnp.dot(x0 + carry, w, preferred_element_type=jnp.float32)
                    return carry + eps * y.ravel()[0]

                return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

            return run

        gemv_bw = w.nbytes / diff_time(make_gemv, (w, x0), 40)

        big = jnp.ones((128, 1024, 1024), jnp.bfloat16)  # 256 MB

        def make_stream(n):
            @jax.jit
            def run(eps, buf):
                def body(i, carry):
                    # carry is 0.0 at runtime; the loop-carried add defeats
                    # hoisting, and abs() blocks the distributive rewrite
                    # sum(x+c) -> sum(x)+c*n that would elide the read.
                    return carry + jnp.sum(jnp.abs(buf + carry), dtype=jnp.float32) * eps

                return jax.lax.fori_loop(0, n, body, jnp.zeros((), jnp.float32))

            return run

        stream_bw = big.nbytes / diff_time(make_stream, (big,), 48)

        candidates = [bw for bw in (gemv_bw, stream_bw) if 1e10 < bw < plausible]
        if not candidates:
            return nominal
        return min(max(candidates), nominal)
    except Exception:
        return nominal
