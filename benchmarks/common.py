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

from conch_tpu.utils.benchmark import BenchmarkResult, benchmark_it


def make_parser(description: str) -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description=description)
    parser.add_argument("--iterations", type=int, default=100)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--csv", action="store_true", help="CSV output instead of pretty")
    parser.add_argument("--seed", type=int, default=0)
    return parser


def run_and_report(args, cases: list[tuple[str, Callable[[], object]]]) -> list[BenchmarkResult]:
    results = []
    for tag, fn in cases:
        results.append(
            benchmark_it(fn, tag, warmup_iterations=args.warmup, num_iterations=args.iterations)
        )
    if args.csv:
        print(BenchmarkResult.csv_header())
        for r in results:
            print(r.csv_row())
    else:
        for r in results:
            print(r.pretty())
    return results


def rng(args) -> np.random.Generator:
    return np.random.default_rng(args.seed)
