#!/bin/bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Round-4 TPU runbook, in priority order against the round-3 VERDICT:
#   1. fast probes that inform kernel fixes (bnb phase isolation, lm_head
#      tiles, decode profile with the magic layout),
#   2. the headline bench,
#   3. the evidence items (hardware test tier, full per-op table, engine
#      rows, long-context sweep, quantized-KV attention rows).
# Each stage runs under timeout and logs to tools/drive/logs/*_r4.log;
# safe to re-run (stages are idempotent; later invocations overwrite).
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

# --- probes (fast, inform fixes) ---
stage exp_bnb_r4 900 python tools/drive/exp_bnb_r4.py
stage exp_lmhead_r4 1200 python tools/drive/exp_lmhead_r4.py
stage exp_decode_profile_r4b 900 python tools/drive/exp_decode_profile.py

# --- headline ---
stage bench_headline_r4 1200 python bench.py

# --- evidence ---
stage tpu_tier_r4 2400 python -m pytest tests/tpu -m tpu -q --no-header -p no:xdist -n 0
stage bench_table_r4 7200 bash tools/benchmarks/run_all.sh
stage engine_r4 1200 python tools/drive/drive_engine_tpu.py
stage kvquant_int8_ctx1024_r4 900 python benchmarks/paged_attention_benchmark.py --seq-len 1024 --kv-dtype int8 --calibrate
stage kvquant_int8_ctx8192_r4 900 python benchmarks/paged_attention_benchmark.py --seq-len 8192 --kv-dtype int8 --calibrate
stage kvquant_fp8_ctx1024_r4 900 python benchmarks/paged_attention_benchmark.py --seq-len 1024 --kv-dtype fp8 --calibrate
stage kvquant_fp8_ctx8192_r4 900 python benchmarks/paged_attention_benchmark.py --seq-len 8192 --kv-dtype fp8 --calibrate
stage longctx_r4 5400 bash tools/benchmarks/collect_paged_attention_sweep.sh
