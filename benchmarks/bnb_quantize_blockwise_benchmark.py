# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""bitsandbytes blockwise quantize microbenchmark (parity: reference
``benchmarks/bnb_quantize_blockwise_benchmark.py`` - the op the reference
runs 10-100x slower than CUDA due to Triton scalar loops)."""

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.quantization.bitsandbytes import quantize_blockwise


def main() -> None:
    parser = make_parser("bnb quantize_blockwise benchmark")
    parser.add_argument("--numel", type=int, default=16 * 1024 * 1024)
    parser.add_argument("--blocksize", type=int, default=64)
    parser.add_argument("--quant-type", default="nf4", choices=["nf4", "fp4"])
    args = parser.parse_args()

    xs = jnp.asarray(rng(args).normal(size=(2, args.numel)), dtype=jnp.bfloat16)
    # Read x, write 4-bit codes + per-block absmax. Rotated input (see
    # benchmark_loop): no residency, no `x + carry` temp traffic.
    nbytes = xs.nbytes // 2 + args.numel // 2 + (args.numel // args.blocksize) * 4
    run_and_report(args, [(
        f"bnb_quantize_{args.quant_type}_b{args.blocksize}",
        lambda carry, x: quantize_blockwise(
            x, blocksize=args.blocksize, quant_type=args.quant_type)[0],
        nbytes, (), None, (xs,),
    )])


if __name__ == "__main__":
    main()
