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
    x = jnp.asarray(r.normal(size=(args.num_tokens, args.hidden_size)), dtype=jnp.bfloat16)
    w = jnp.asarray(r.normal(size=(args.hidden_size,)), dtype=jnp.bfloat16)

    run_and_report(args, [(
        "gemma_rms_norm",
        lambda carry, x, w: gemma_rms_norm(x + carry, w, 1e-6),
        2 * x.nbytes + w.nbytes, (x, w),
    )])


if __name__ == "__main__":
    main()
