# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Gemma RMS norm microbenchmark (parity: reference ``benchmarks/gemma_rms_norm_benchmark.py``)."""

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.normalization import gemma_rms_norm


def main() -> None:
    parser = make_parser("Gemma RMS norm benchmark")
    parser.add_argument("--num-tokens", type=int, default=4096)
    parser.add_argument("--hidden-size", type=int, default=3072)
    args = parser.parse_args()

    r = rng(args)
    # Rotated input stack (see benchmark_loop): consecutive iterations read
    # different HBM, so neither the input nor a VMEM-resident copy can be
    # reused across loop iterations, and no `x + carry` temp distorts the
    # bytes accounting.
    L = max(2, (2 * 16 << 20) // (args.num_tokens * args.hidden_size * 2))
    xs = jnp.asarray(r.normal(size=(L, args.num_tokens, args.hidden_size)), dtype=jnp.bfloat16)
    w = jnp.asarray(r.normal(size=(args.hidden_size,)), dtype=jnp.bfloat16)

    run_and_report(args, [(
        "gemma_rms_norm",
        lambda carry, w, x: gemma_rms_norm(x, w, 1e-6),
        2 * xs.nbytes // L + w.nbytes, (w,), None, (xs,),
    )])


if __name__ == "__main__":
    main()
