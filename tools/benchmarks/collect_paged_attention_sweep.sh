#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Long-context paged attention sweep (parity: reference
# tools/benchmarks/collect_paged_attention_vs_flash.sh - Llama-3.1-405B
# attention shape, seq 32 -> 131072, capped to fit one chip's HBM).
# Writes per-seq CSVs (with a seq_len column) into $OUT_DIR for
# tools/plot_benchmark_results.py.
set -euo pipefail
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
OUT_DIR="${OUT_DIR:-benchmark_results/paged_attention_sweep}"
BENCH="${BENCH:-paged_attention_benchmark}"
mkdir -p "$OUT_DIR"
for seq in 32 128 512 2048 8192 32768 131072; do
  batch=4
  # keep KV cache under ~8 GB: batch * seq * 8 heads * 128 * 2 * 2B
  if [ "$seq" -ge 32768 ]; then batch=1; fi
  python "benchmarks/${BENCH}.py" --csv --calibrate \
    --batch "$batch" --num-q-heads 32 --num-kv-heads 8 --head-size 128 \
    --seq-len "$seq" --iterations "${ITERATIONS:-20}" \
    | awk -v s="$seq" '/^#/{print; next} /^tag,/{print $0",seq_len"; next} {print $0","s}' \
    | tee "$OUT_DIR/seq${seq}.csv"
done
