# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""RMS norm microbenchmark (parity: reference ``benchmarks/rms_norm_benchmark.py``)."""

import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.normalization import fused_add_rms_norm, rms_norm


def main() -> None:
    parser = make_parser("RMS norm benchmark")
    parser.add_argument("--num-tokens", type=int, default=4096)
    parser.add_argument("--hidden-size", type=int, default=4096)
    args = parser.parse_args()

    r = rng(args)
    # Rotated input stacks (see benchmark_loop): no VMEM residency across
    # iterations, no `x + carry` temp distorting bytes accounting.
    L = max(2, (2 * 16 << 20) // (args.num_tokens * args.hidden_size * 2))
    xs = jnp.asarray(r.normal(size=(L, args.num_tokens, args.hidden_size)), dtype=jnp.bfloat16)
    ress = jnp.asarray(r.normal(size=(L, args.num_tokens, args.hidden_size)), dtype=jnp.bfloat16)
    w = jnp.asarray(r.normal(size=(args.hidden_size,)), dtype=jnp.bfloat16)
    per = xs.nbytes // L

    run_and_report(args, [
        ("rms_norm",
         lambda carry, w, x, res: rms_norm(x, w, 1e-6),
         2 * per + w.nbytes, (w,), None, (xs, ress)),
        ("fused_add_rms_norm",
         lambda carry, w, x, res: fused_add_rms_norm(x, res, w, 1e-6),
         4 * per + w.nbytes, (w,), None, (xs, ress)),
    ])


if __name__ == "__main__":
    main()
