# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Scaled GEMM microbenchmark (parity: reference ``benchmarks/scaled_gemm_benchmark.py``)."""

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.quantization.gemm import scaled_gemm


def main() -> None:
    parser = make_parser("Scaled GEMM benchmark")
    parser.add_argument("--m", type=int, default=16)
    parser.add_argument("--k", type=int, default=4096)
    parser.add_argument("--n", type=int, default=4096)
    args = parser.parse_args()

    r = rng(args)
    # Rotated weight stack (see benchmark_loop): a loop-invariant int8 B of
    # the default shape (16 MB) fits VMEM and would otherwise be hoisted.
    L = max(2, (2 * 16 << 20) // (args.k * args.n))
    a = jnp.asarray(r.integers(-127, 128, size=(args.m, args.k)), dtype=jnp.int8)
    bs = jnp.asarray(r.integers(-127, 128, size=(L, args.k, args.n)), dtype=jnp.int8)
    sa = jnp.asarray(r.uniform(0.001, 0.01, size=(args.m,)), dtype=jnp.float32)
    sb = jnp.asarray(r.uniform(0.001, 0.01, size=(args.n,)), dtype=jnp.float32)

    run_and_report(args, [
        (f"scaled_gemm_int8_m{args.m}",
         # a/b are int8: inject the carry through the (float) row scales.
         lambda carry, a, sa, sb, b: scaled_gemm(a, b, sa + carry, sb, jnp.bfloat16),
         a.nbytes + bs.nbytes // L + args.m * args.n * 2, (a, sa, sb), None, (bs,)),
    ])


if __name__ == "__main__":
    main()
