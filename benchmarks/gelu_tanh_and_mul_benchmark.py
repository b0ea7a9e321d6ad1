# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""GeLU-tanh-and-mul microbenchmark (parity: reference ``benchmarks/gelu_tanh_and_mul_benchmark.py``)."""

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.activation import gelu_tanh_and_mul


def main() -> None:
    parser = make_parser("GeLU-tanh-and-mul benchmark")
    parser.add_argument("--num-tokens", type=int, default=4096)
    parser.add_argument("--d", type=int, default=14336)
    args = parser.parse_args()

    # Rotated input stack (see benchmark_loop): honest bytes accounting,
    # no VMEM residency, no `x + carry` temp traffic.
    L = 2
    xs = jnp.asarray(rng(args).normal(size=(L, args.num_tokens, 2 * args.d)), dtype=jnp.bfloat16)
    per = xs.nbytes // L
    run_and_report(args, [(
        "gelu_tanh_and_mul",
        lambda carry, x: gelu_tanh_and_mul(x),
        per + per // 2, (), None, (xs,),
    )])


if __name__ == "__main__":
    main()
