#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Mixed-precision GEMM sweep over M (decode batch): int4 and int8 weights
# on a Llama-8B-sized projection.
set -euo pipefail
cd "$(dirname "$0")/../.."
OUT_DIR="${OUT_DIR:-benchmark_results/gemm_sweep}"
mkdir -p "$OUT_DIR"
for m in 1 8 16 64 256 1024; do
  for bits in 4 8; do
    python benchmarks/mixed_precision_gemm_benchmark.py --csv \
      --m "$m" --k 4096 --n 4096 --bits "$bits" --iterations "${ITERATIONS:-20}" \
      | awk -v m="$m" 'NR==1{print $0",m"} NR>1{print $0","m}' \
      | tee "$OUT_DIR/m${m}_w${bits}.csv"
  done
done
