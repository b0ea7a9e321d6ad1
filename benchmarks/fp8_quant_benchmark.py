# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""FP8 static quant microbenchmark (parity: reference ``benchmarks/fp8_quant_benchmark.py``)."""

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.quantization.fp8 import scaled_fp8_quant


def main() -> None:
    parser = make_parser("FP8 static quantization benchmark")
    parser.add_argument("--num-tokens", type=int, default=4096)
    parser.add_argument("--hidden-size", type=int, default=4096)
    args = parser.parse_args()

    x = jnp.asarray(rng(args).normal(size=(args.num_tokens, args.hidden_size)) * 30, dtype=jnp.bfloat16)
    scale = jnp.asarray([0.4], dtype=jnp.float32)
    run_and_report(args, [(
        "fp8_static_quant",
        lambda carry, x, scale: scaled_fp8_quant(x + carry, scale),
        x.nbytes + x.size, (x, scale),
    )])


if __name__ == "__main__":
    main()
