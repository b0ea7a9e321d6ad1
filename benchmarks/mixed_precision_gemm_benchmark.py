# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Mixed-precision GEMM microbenchmark (parity: reference
``benchmarks/mixed_precision_gemm_benchmark.py``; also reports the bf16
dense matmul for the roofline comparison)."""

import jax.numpy as jnp
import numpy as np

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.quantization.gemm import mixed_precision_gemm
from conch_tpu.types import scalar_types
from conch_tpu.utils.quant_utils import pack_rows, pack_rows_planar, quantize_weights


def main() -> None:
    parser = make_parser("Mixed-precision GEMM benchmark")
    parser.add_argument("--m", type=int, default=16)
    parser.add_argument("--k", type=int, default=4096)
    parser.add_argument("--n", type=int, default=4096)
    parser.add_argument("--bits", type=int, default=4, choices=[4, 8])
    parser.add_argument("--group-size", type=int, default=128)
    args = parser.parse_args()

    r = rng(args)
    qt = scalar_types.uint4b8 if args.bits == 4 else scalar_types.uint8b128
    w = r.normal(size=(args.k, args.n)).astype(np.float32) * 0.02
    _, w_q, w_s, _ = quantize_weights(w, qt, args.group_size)
    packed = jnp.asarray(pack_rows(w_q, args.bits))
    scales = jnp.asarray(w_s, dtype=jnp.bfloat16)
    x = jnp.asarray(r.normal(size=(args.m, args.k)), dtype=jnp.bfloat16)
    w_dense = jnp.asarray(w, dtype=jnp.bfloat16)

    import jax
    dense = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype))

    out_bytes = args.m * args.n * 2
    packed_planar = jnp.asarray(pack_rows_planar(w_q, args.bits, args.group_size))
    run_and_report(args, [
        (f"mixed_gemm_w{args.bits}a16_m{args.m}",
         lambda carry, x, packed, scales: mixed_precision_gemm(
             x + carry, packed, scales, None, args.bits, qt.bias, args.group_size),
         packed.nbytes + scales.nbytes + x.nbytes + out_bytes, (x, packed, scales)),
        (f"mixed_gemm_w{args.bits}a16_m{args.m}_planar",
         lambda carry, x, pp, scales: mixed_precision_gemm(
             x + carry, pp, scales, None, args.bits, qt.bias, args.group_size,
             layout="planar"),
         packed_planar.nbytes + scales.nbytes + x.nbytes + out_bytes, (x, packed_planar, scales)),
        ("dense_bf16_matmul",
         lambda carry, x, wd: dense(x + carry, wd),
         w_dense.nbytes + x.nbytes + out_bytes, (x, w_dense)),
    ])


if __name__ == "__main__":
    main()
