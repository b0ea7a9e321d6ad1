# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""copy_blocks microbenchmark (parity: reference ``benchmarks/copy_blocks_benchmark.py``)."""

import jax.numpy as jnp
import numpy as np

from benchmarks.common import make_parser, rng, run_and_report, runtime_zero_i32
from conch_tpu.ops.cache import copy_blocks


def main() -> None:
    parser = make_parser("copy_blocks benchmark")
    parser.add_argument("--num-layers", type=int, default=8)
    parser.add_argument("--num-pages", type=int, default=1024)
    parser.add_argument("--row-bytes", type=int, default=32 * 8 * 128)
    parser.add_argument("--num-pairs", type=int, default=64)
    args = parser.parse_args()

    r = rng(args)
    caches_k = [
        jnp.asarray(r.normal(size=(args.num_pages, args.row_bytes)), dtype=jnp.bfloat16)
        for _ in range(args.num_layers)
    ]
    caches_v = [
        jnp.asarray(r.normal(size=(args.num_pages, args.row_bytes)), dtype=jnp.bfloat16)
        for _ in range(args.num_layers)
    ]
    pairs = r.choice(args.num_pages, size=(args.num_pairs, 2), replace=False).astype(np.int32)
    mapping = jnp.asarray(pairs)

    # Each pair copies one row in every layer's K and V cache (read+write).
    row_nbytes = args.row_bytes * 2
    nbytes = args.num_layers * 2 * args.num_pairs * row_nbytes * 2
    run_and_report(args, [(
        f"copy_blocks_l{args.num_layers}_p{args.num_pairs}",
        # Caches ride the loop carry (in-place updates across iterations);
        # the mapping is perturbed by a runtime-zero so each iteration
        # stays carry-dependent.
        lambda carry, state, mapping: tuple(
            copy_blocks(state[0], state[1], mapping + runtime_zero_i32(carry))
        ),
        nbytes, (mapping,), (caches_k, caches_v),
    )])


if __name__ == "__main__":
    main()
