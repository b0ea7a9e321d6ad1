#!/usr/bin/env bash
# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
# Smoke-run every benchmark CLI with tiny shapes on CPU: proves each file
# parses, builds operands, and reaches measurement without crashing, so a
# hardware run of tools/benchmarks/run_all.sh can't die on a code bug
# (round-3 bench_gemm crash guard). Runs in interpret mode; numbers are
# meaningless and discarded.
set -uo pipefail
cd "$(dirname "$0")/../.."
export JAX_PLATFORMS=cpu
export PYTHONPATH="$PWD"
FAILED=0
run() {
  local name=$1; shift
  if timeout 600 python "benchmarks/${name}_benchmark.py" --iterations 2 --loop 2 --csv "$@" > /tmp/smoke_$name.log 2>&1; then
    echo "ok   $name"
  else
    echo "FAIL $name (rc=$?)"; tail -5 /tmp/smoke_$name.log | sed 's/^/     /'
    FAILED=1
  fi
}

run bev_pool --num-intervals 512 --mean-points 2 --channels 16 --grid 32
run bnb_dequantize_blockwise --numel 16384 --blocksize 64
run bnb_quantize_blockwise --numel 16384 --blocksize 64
run copy_blocks --num-layers 2 --num-pages 32 --row-bytes 1024 --num-pairs 8
run engine --num-layers 2 --batch 2 --context 64
run fp8_quant --num-tokens 64 --hidden-size 256
run gelu_tanh_and_mul --num-tokens 64 --d 256
run gemma_rms_norm --num-tokens 64 --hidden-size 256
run int8_quant --num-tokens 64 --hidden-size 256
run mixed_precision_gemm --m 8 --k 256 --n 256 --group-size 64
run mla_attention --batch 2 --num-heads 4 --seq-len 64 --page-size 16 --q-len 1
run nms --num-boxes 128
run paged_attention --batch 2 --num-q-heads 4 --num-kv-heads 2 --head-size 64 --seq-len 64 --page-size 16
run paged_attention_vs_flash --batch 2 --num-q-heads 4 --num-kv-heads 2 --head-size 64 --seq-len 64 --page-size 16
run reshape_and_cache --num-tokens 32 --num-kv-heads 2 --head-size 64 --num-pages 16 --page-size 16
run rms_norm --num-tokens 64 --hidden-size 256
run rotary_embedding --num-tokens 64 --num-q-heads 4 --num-kv-heads 2 --head-size 64
run scaled_gemm --m 8 --k 256 --n 256
run silu_and_mul --num-tokens 64 --d 256
run varlen_attention --batch 2 --num-q-heads 4 --num-kv-heads 2 --head-size 64 --seq-len 64 --page-size 16
run voxelization --num-points 512 --max-points-per-voxel 8
exit $FAILED
