# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Paged attention microbenchmark (parity: reference
``benchmarks/paged_attention_benchmark.py``; default shapes scaled to fit
one v5e: batch 32 instead of 128)."""

import math

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.attention import paged_attention
from conch_tpu.utils.test_utils import create_paged_fixture


def main() -> None:
    parser = make_parser("Paged attention benchmark")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--num-q-heads", type=int, default=32)
    parser.add_argument("--num-kv-heads", type=int, default=8)
    parser.add_argument("--head-size", type=int, default=128)
    parser.add_argument("--seq-len", type=int, default=8192)
    parser.add_argument("--page-size", type=int, default=32)
    parser.add_argument(
        "--kv-dtype", default="bf16", choices=["bf16", "int8", "fp8"],
        help="KV cache storage dtype (north-star serving uses quantized KV)",
    )
    args = parser.parse_args()

    fx = create_paged_fixture(
        rng(args), batch=args.batch, num_q_heads=args.num_q_heads,
        num_kv_heads=args.num_kv_heads, head_size=args.head_size,
        page_size=args.page_size, seq_lens=[args.seq_len] * args.batch,
        dtype=jnp.bfloat16,
    )
    key_cache, value_cache = fx.key_cache, fx.value_cache
    kwargs = {}
    if args.kv_dtype == "int8":
        qs = 0.05
        key_cache = jnp.clip(jnp.round(key_cache.astype(jnp.float32) / qs), -128, 127).astype(jnp.int8)
        value_cache = jnp.clip(jnp.round(value_cache.astype(jnp.float32) / qs), -128, 127).astype(jnp.int8)
        kwargs = dict(
            kv_cache_dtype="int8",
            k_scale=jnp.asarray([qs], jnp.float32),
            v_scale=jnp.asarray([qs], jnp.float32),
        )
    elif args.kv_dtype == "fp8":
        qs = 1.0 / 8.0
        key_cache = (key_cache.astype(jnp.float32) / qs).astype(jnp.float8_e4m3fn).view(jnp.uint8)
        value_cache = (value_cache.astype(jnp.float32) / qs).astype(jnp.float8_e4m3fn).view(jnp.uint8)
        kwargs = dict(
            kv_cache_dtype="fp8",
            k_scale=jnp.asarray([qs], jnp.float32),
            v_scale=jnp.asarray([qs], jnp.float32),
        )

    scale = 1.0 / math.sqrt(args.head_size)
    # Decode reads the whole KV working set once: that is the roofline.
    kv_bytes = 2 * args.batch * args.seq_len * args.num_kv_heads * args.head_size * key_cache.dtype.itemsize
    run_and_report(args, [(
        f"paged_attention_b{args.batch}_s{args.seq_len}_{args.kv_dtype}",
        lambda carry, q, kc, vc, bt, sl: paged_attention(
            q + carry, kc, vc, bt, sl, scale=scale, **kwargs),
        kv_bytes,
        (fx.query, key_cache, value_cache, fx.block_table, fx.seq_lens),
    )])


if __name__ == "__main__":
    main()
