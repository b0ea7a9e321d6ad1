# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Rotary embedding microbenchmark (parity: reference ``benchmarks/rotary_embedding_benchmark.py``)."""

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.embedding import rotary_embedding
from conch_tpu.reference.embedding.rotary_embedding import compute_cos_sin_cache


def main() -> None:
    parser = make_parser("Rotary embedding benchmark")
    parser.add_argument("--num-tokens", type=int, default=4096)
    parser.add_argument("--num-q-heads", type=int, default=32)
    parser.add_argument("--num-kv-heads", type=int, default=8)
    parser.add_argument("--head-size", type=int, default=128)
    args = parser.parse_args()

    r = rng(args)
    cache = compute_cos_sin_cache(500000.0, args.head_size, 8192)
    pos = jnp.asarray(r.integers(0, 8192, size=(args.num_tokens,)), dtype=jnp.int32)
    # Rotated q/k stacks (see benchmark_loop): at the default shape q+k is
    # ~10 MB and would otherwise sit VMEM-resident across loop iterations.
    L = 4
    qs = jnp.asarray(r.normal(size=(L, args.num_tokens, args.num_q_heads * args.head_size)), dtype=jnp.bfloat16)
    ks = jnp.asarray(r.normal(size=(L, args.num_tokens, args.num_kv_heads * args.head_size)), dtype=jnp.bfloat16)

    run_and_report(args, [(
        "rotary_embedding",
        lambda carry, pos, cache, q, k: rotary_embedding(pos, q, k, args.head_size, cache),
        2 * (qs.nbytes + ks.nbytes) // L, (pos, cache), None, (qs, ks),
    )])


if __name__ == "__main__":
    main()
