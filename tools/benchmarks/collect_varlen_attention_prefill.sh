#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Varlen prefill attention sweep over sequence length (parity: reference
# tools/benchmarks/collect_varlen_attention_prefill.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
OUT_DIR="${OUT_DIR:-benchmark_results/varlen_prefill}"
mkdir -p "$OUT_DIR"
for seq in 128 512 2048 8192; do
  python benchmarks/varlen_attention_benchmark.py --csv \
    --batch 4 --num-q-heads 32 --num-kv-heads 8 --head-size 128 \
    --seq-len "$seq" --iterations "${ITERATIONS:-20}" \
    | awk -v s="$seq" 'NR==1{print $0",seq_len"} NR>1{print $0","s}' \
    | tee "$OUT_DIR/seq${seq}.csv"
done
