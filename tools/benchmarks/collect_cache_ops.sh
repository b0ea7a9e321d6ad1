#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Cache-management op sweeps (parity: reference collect_copy_blocks.sh +
# collect_reshape_and_cache.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
OUT_DIR="${OUT_DIR:-benchmark_results/cache_ops}"
mkdir -p "$OUT_DIR"
for tokens in 256 1024 4096 16384; do
  python benchmarks/reshape_and_cache_benchmark.py --csv \
    --num-tokens "$tokens" --iterations "${ITERATIONS:-20}" \
    | awk -v t="$tokens" 'NR==1{print $0",num_tokens"} NR>1{print $0","t}' \
    | tee "$OUT_DIR/reshape_t${tokens}.csv"
done
for pairs in 16 64 256 1024; do
  python benchmarks/copy_blocks_benchmark.py --csv \
    --num-pairs "$pairs" --iterations "${ITERATIONS:-20}" \
    | awk -v p="$pairs" 'NR==1{print $0",num_pairs"} NR>1{print $0","p}' \
    | tee "$OUT_DIR/copy_p${pairs}.csv"
done
