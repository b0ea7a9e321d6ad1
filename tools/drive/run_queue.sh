#!/bin/bash
# Session-local TPU work queue: serialize hardware stages behind whatever
# is currently holding the chip (pass the PID to wait for as $1).
set -u
cd "$(dirname "$0")/../.."
export PYTHONPATH="$PWD:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-$PWD/.jax_cache}"
mkdir -p tools/drive/logs

if [ $# -ge 1 ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 5; done
fi

stage() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name start $(date +%H:%M:%S) ===" >> tools/drive/logs/queue.log
  timeout "$tmo" "$@" > "tools/drive/logs/$name.log" 2>&1
  echo "=== $name done rc=$? $(date +%H:%M:%S) ===" >> tools/drive/logs/queue.log
}

stage bench_headline 1200 python bench.py
stage bench_table 4200 bash tools/benchmarks/run_all.sh
stage engine 900 python tools/drive/drive_engine_tpu.py
stage longctx 3600 bash tools/benchmarks/collect_paged_attention_sweep.sh
