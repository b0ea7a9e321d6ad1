# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""reshape_and_cache microbenchmark (parity: reference
``benchmarks/reshape_and_cache_benchmark.py``)."""

import jax.numpy as jnp
import numpy as np

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.cache import reshape_and_cache


def main() -> None:
    parser = make_parser("reshape_and_cache benchmark")
    parser.add_argument("--num-tokens", type=int, default=4096)
    parser.add_argument("--num-kv-heads", type=int, default=8)
    parser.add_argument("--head-size", type=int, default=128)
    parser.add_argument("--num-pages", type=int, default=2048)
    parser.add_argument("--page-size", type=int, default=32)
    args = parser.parse_args()

    r = rng(args)
    key = jnp.asarray(r.normal(size=(args.num_tokens, args.num_kv_heads, args.head_size)), dtype=jnp.bfloat16)
    value = jnp.asarray(r.normal(size=(args.num_tokens, args.num_kv_heads, args.head_size)), dtype=jnp.bfloat16)
    slots = jnp.asarray(
        r.choice(args.num_pages * args.page_size, size=args.num_tokens, replace=False), dtype=jnp.int32
    )
    cache_shape = (args.num_pages, args.num_kv_heads, args.page_size, args.head_size)

    state = {
        "k": jnp.zeros(cache_shape, jnp.bfloat16),
        "v": jnp.zeros(cache_shape, jnp.bfloat16),
    }

    def step(carry, st, key, value, slots):
        k, v = reshape_and_cache(key + carry, value, st["k"], st["v"], slots)
        return {"k": k, "v": v}

    # Read the new tokens, scatter-write them into both caches.
    nbytes = 2 * (key.nbytes + value.nbytes)
    run_and_report(args, [(
        f"reshape_and_cache_t{args.num_tokens}",
        step, nbytes, (key, value, slots), state,
    )])


if __name__ == "__main__":
    main()
