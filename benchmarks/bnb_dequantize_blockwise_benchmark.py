# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""bitsandbytes blockwise dequantize microbenchmark (parity: reference
``benchmarks/bnb_dequantize_blockwise_benchmark.py``)."""

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.quantization.bitsandbytes import dequantize_blockwise, quantize_blockwise


def main() -> None:
    parser = make_parser("bnb dequantize_blockwise benchmark")
    parser.add_argument("--numel", type=int, default=16 * 1024 * 1024)
    parser.add_argument("--blocksize", type=int, default=64)
    parser.add_argument("--quant-type", default="nf4", choices=["nf4", "fp4"])
    args = parser.parse_args()

    x = jnp.asarray(rng(args).normal(size=(2, args.numel)), dtype=jnp.bfloat16)
    packed0, state = quantize_blockwise(x[0], blocksize=args.blocksize, quant_type=args.quant_type)
    packed1, _ = quantize_blockwise(x[1], blocksize=args.blocksize, quant_type=args.quant_type)
    packeds = jnp.stack([packed0, packed1])
    # Read codes + absmax, write bf16 output. Rotated input (see
    # benchmark_loop): no residency, no carry-add temp traffic.
    nbytes = packeds.nbytes // 2 + (args.numel // args.blocksize) * 4 + args.numel * 2
    run_and_report(args, [(
        f"bnb_dequantize_{args.quant_type}_b{args.blocksize}",
        lambda carry, packed: dequantize_blockwise(packed, quant_state=state),
        nbytes, (), None, (packeds,),
    )])


if __name__ == "__main__":
    main()
