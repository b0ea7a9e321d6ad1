#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Run the full microbenchmark sweep and regenerate the results table
# (parity: reference tools/benchmarks/run_all.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
python tools/create_benchmark_results_table.py --iterations "${ITERATIONS:-50}" --output BENCH_RESULTS.md
echo "wrote BENCH_RESULTS.md"
