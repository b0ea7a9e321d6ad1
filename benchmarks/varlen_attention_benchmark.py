# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Varlen attention microbenchmark (parity: reference
``benchmarks/varlen_attention_benchmark.py``)."""

import math

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.attention import varlen_attention
from conch_tpu.utils.test_utils import create_paged_fixture


def main() -> None:
    parser = make_parser("Varlen attention benchmark")
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--num-q-heads", type=int, default=32)
    parser.add_argument("--num-kv-heads", type=int, default=8)
    parser.add_argument("--head-size", type=int, default=128)
    parser.add_argument("--seq-len", type=int, default=2048)
    parser.add_argument("--page-size", type=int, default=32)
    args = parser.parse_args()

    fx = create_paged_fixture(
        rng(args), batch=args.batch, num_q_heads=args.num_q_heads,
        num_kv_heads=args.num_kv_heads, head_size=args.head_size,
        page_size=args.page_size, seq_lens=[args.seq_len] * args.batch,
        q_lens=[args.seq_len] * args.batch, dtype=jnp.bfloat16,
    )
    scale = 1.0 / math.sqrt(args.head_size)
    kv_bytes = (
        2 * args.batch * args.seq_len * args.num_kv_heads * args.head_size
        * fx.key_cache.dtype.itemsize
    )
    operands = (fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens)
    run_and_report(args, [(
        f"varlen_attention_prefill_b{args.batch}_s{args.seq_len}",
        lambda carry, q, kc, vc, bt, sl: varlen_attention(
            q + carry, kc, vc, fx.cu_seqlens_q, fx.max_seqlen_q,
            sl, fx.max_seqlen_k, bt, causal=True, scale=scale),
        kv_bytes + 2 * fx.query.nbytes, operands,
    )])


if __name__ == "__main__":
    main()
