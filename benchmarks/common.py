# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Shared CLI scaffolding for the per-op microbenchmarks.

Parity with the reference's ``benchmarks/*_benchmark.py`` click CLIs:
every op has a benchmark entry point printing the same CSV schema
(``conch/utils/benchmark.py``). Run any bench as
``python benchmarks/<op>_benchmark.py [--csv] [shape options]``.
"""

from __future__ import annotations

import argparse
from typing import Callable

import numpy as np


def _ensure_backend() -> None:
    """Fall back to auto platform selection when JAX_PLATFORMS is stale.

    Drive environments export ``JAX_PLATFORMS=axon`` (the tunneled-TPU
    PJRT plugin) but scripts are sometimes run with a PYTHONPATH that
    drops the plugin's sitecustomize; the named backend then never
    registers and the first ``device_put`` raises "Backend 'axon' is not
    in the list of known backends", killing the whole CLI before a single
    measurement (round-3 bench_gemm_r3.log). Probe once at import and
    clear the platform pin if it names an unregistered backend.
    """
    import jax

    try:
        jax.devices()
    except RuntimeError:
        jax.config.update("jax_platforms", "")
        jax.devices()


_ensure_backend()

from conch_tpu.utils.benchmark import BenchmarkResult, benchmark_it, benchmark_loop  # noqa: E402


def make_parser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--iterations", type=int, default=100)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--loop", type=int, default=10, help="iterations per dispatch for loop-style cases")
    parser.add_argument("--csv", action="store_true", help="CSV output instead of pretty")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--calibrate", action="store_true",
        help="measure this process's achievable HBM bandwidth and report it "
        "with the results (same-window honesty: the tunneled chip "
        "fluctuates, so a calibration taken in another process/window "
        "cannot anchor these rows)",
    )
    return parser


def run_and_report(args, cases: list[tuple]) -> list[BenchmarkResult]:
    """Benchmark cases and print the report.

    Case forms:
    - ``(tag, fn)``: wall-clock timing of ``fn()`` per call (host-visible
      ops, engine steps).
    - ``(tag, step_fn, bytes_moved[, operands[, state[, rotated]]])``:
      trustworthy loop-in-one-dispatch timing; ``step_fn`` takes the f32
      scalar carry (fold it into an input) then ``operands`` then one
      slice of each ``rotated`` operand, and the row reports achieved
      GB/s from ``bytes_moved``. Pass big arrays via operands, not
      closure (closure constants bloat the compile payload). With
      ``state``, ``step_fn(carry, state, *operands) -> new_state`` and
      the state pytree is threaded through the loop (in-place buffer
      updates). ``rotated`` operands carry a leading buffer dim cycled
      per iteration so weights can't stay VMEM-resident across the loop
      (see ``benchmark_loop``); use it for every loop-invariant operand
      bigger than a few hundred KB. An optional 7th element
      ``pass_index=True`` calls ``step_fn(carry, i, *operands)`` with the
      loop counter instead — zero-copy rotation for ops with a native
      buffer index (the stacked scalar-prefetch GEMM).
    """
    results = []
    for case in cases:
        if len(case) >= 3:
            tag, step_fn, bytes_moved = case[:3]
            operands = case[3] if len(case) > 3 else ()
            state = case[4] if len(case) > 4 else None
            rotated = case[5] if len(case) > 5 else ()
            pass_index = case[6] if len(case) > 6 else False
            results.append(
                benchmark_loop(
                    step_fn, tag, operands=operands, state=state,
                    rotated_operands=rotated,
                    iters_per_dispatch=args.loop,
                    reps=max(3, args.iterations // args.loop), bytes_moved=bytes_moved,
                    pass_index=pass_index,
                )
            )
            continue
        tag, fn = case
        results.append(
            benchmark_it(fn, tag, warmup_iterations=args.warmup, num_iterations=args.iterations)
        )
    cal_gbps = None
    if getattr(args, "calibrate", False):
        from conch_tpu.utils.benchmark import calibrate_hbm_bw

        cal_gbps = calibrate_hbm_bw() / 1e9
    from conch_tpu.utils.benchmark import record_measurements

    record_measurements(results, calibration_gbps=cal_gbps)
    if args.csv:
        if cal_gbps is not None:
            print(f"# calibration_gbps,{cal_gbps:.1f}")
        print(BenchmarkResult.csv_header())
        for r in results:
            print(r.csv_row())
    else:
        if cal_gbps is not None:
            print(f"calibrated bandwidth this window: {cal_gbps:.1f} GB/s")
        for r in results:
            print(r.pretty())
    return results


def rng(args) -> np.random.Generator:
    return np.random.default_rng(args.seed)


def runtime_zero_i32(carry):
    """An int32 that is 0 at runtime but data-depends on the loop carry.

    For ops whose only float inputs are too large to cheaply add the carry
    to (or that have none), perturb an *index* operand by this instead:
    it keeps each loop iteration data-dependent (XLA cannot hoist the op
    out of the timing loop) at the cost of one scalar convert. ``carry``
    is a traced value, so ``carry * tiny`` cannot be constant-folded.
    """
    import jax.numpy as jnp

    return (carry * 1e-30).astype(jnp.int32)
