#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Decode-attention shoot-out sweep (parity: reference
# tools/benchmarks/collect_paged_attention_vs_flash.sh): paged_attention
# vs varlen_attention vs the XLA dense baseline across sequence lengths.
# Plot with:
#   python tools/plot_benchmark_results.py \
#     --results-directory benchmark_results/paged_vs_flash \
#     --x-axis seq_len --logx --logy
set -euo pipefail
export OUT_DIR="${OUT_DIR:-benchmark_results/paged_vs_flash}"
export BENCH=paged_attention_vs_flash_benchmark
exec "$(dirname "$0")/collect_paged_attention_sweep.sh"
