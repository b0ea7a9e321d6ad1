#!/bin/bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# One-window TPU validation runbook: runs the hardware tasks in priority
# order, each under timeout, logging to tools/drive/logs/. Run when the
# tunnel is healthy; safe to re-run (later stages pick up where logs
# left off — each stage is idempotent).
set -u
cd "$(dirname "$0")/../.."
mkdir -p tools/drive/logs
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
# Persistent XLA compile cache: repeated shapes skip the ~30s remote
# compile round trip on the tunneled chip.
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "tools/drive/logs/$name.log" 2>&1
  local rc=$?
  tail -40 "tools/drive/logs/$name.log"
  echo "=== $name done rc=$rc ==="
}

# 1. varlen chunk-geometry sweep (pick the default)
stage varlen_tuning 900 python tools/drive/drive_varlen_tuning.py --seq 2048 --batch 8

# 2. TPU hardware test tier (Mosaic-lowers every kernel)
stage tpu_tier 1800 python -m pytest tests/tpu -m tpu -q --no-header -n 0

# 3. headline bench
stage bench_headline 1200 python bench.py

# 4. per-op results table (the long one)
stage bench_table 5400 bash tools/benchmarks/run_all.sh

# 5. long-context sweep to 131072
stage longctx 3600 bash tools/benchmarks/collect_paged_attention_sweep.sh

# 6. engine serving drive (continuous batching, spec decode, multi-step)
stage engine 1200 python tools/drive/drive_engine_tpu.py
