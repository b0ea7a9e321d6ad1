#!/bin/bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Round-5 TPU runbook, in priority order against the round-4 VERDICT:
#   1. headline bench + fused decode profile (validates the QKV/gate-up
#      fusion and the no-waste attention DMA fix),
#   2. BENCH_RESULTS.md regeneration on hardware (4th round of asking —
#      runs EARLY, not last),
#   3. long-context sweep to 131072 (3rd ask), quantized-KV rows,
#   4. bnb codec windows TWICE (two-window agreement requirement),
#   5. hardware test tier, engine rows (steady-state prefill + TTFT).
# Each stage runs under timeout and logs to tools/drive/logs/*_r5.log;
# safe to re-run (idempotent; later invocations overwrite). The real
# chip serves ONE client at a time: never run stages concurrently.
set -u
cd "$(dirname "$0")/../.."
mkdir -p tools/drive/logs
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date -u +%H:%M:%S) ==="
  timeout "$tmo" "$@" > "tools/drive/logs/$name.log" 2>&1
  local rc=$?
  tail -25 "tools/drive/logs/$name.log"
  echo "=== $name done rc=$rc $(date -u +%H:%M:%S) ==="
}

# --- 1. headline + profile (fusion validation) ---
stage bench_headline_r5 1800 python bench.py
stage exp_decode_profile_r5 1200 python tools/drive/exp_decode_profile.py

# --- 2. the per-op hardware table (4th ask; do NOT defer) ---
stage bnb_window1_r5 900 python tools/drive/exp_bnb_r4.py
stage bench_table_r5 10800 bash tools/benchmarks/run_all.sh

# --- 3. long-context + quantized-KV evidence ---
stage longctx_r5 5400 bash tools/benchmarks/collect_paged_attention_sweep.sh
stage kvquant_int8_ctx1024_r5 900 python benchmarks/paged_attention_benchmark.py --seq-len 1024 --kv-dtype int8 --calibrate
stage kvquant_int8_ctx8192_r5 900 python benchmarks/paged_attention_benchmark.py --seq-len 8192 --kv-dtype int8 --calibrate
stage kvquant_fp8_ctx1024_r5 900 python benchmarks/paged_attention_benchmark.py --seq-len 1024 --kv-dtype fp8 --calibrate
stage kvquant_fp8_ctx8192_r5 900 python benchmarks/paged_attention_benchmark.py --seq-len 8192 --kv-dtype fp8 --calibrate

# --- 4. bnb second window (two-window agreement) ---
stage bnb_window2_r5 900 python tools/drive/exp_bnb_r4.py

# --- 5. hardware tier + engine rows ---
stage tpu_tier_r5 3600 python -m pytest tests/tpu -m tpu -q --no-header
stage engine_r5 2400 python tools/drive/drive_engine_tpu.py
stage engine_bench_r5 2400 python -m benchmarks.engine_benchmark --num-layers 32 --iterations 10 --warmup 2
