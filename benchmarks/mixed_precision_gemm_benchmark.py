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
from conch_tpu.utils.quant_utils import (
    pack_rows,
    pack_rows_magic,
    pack_rows_planar,
    quantize_weights,
)


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

    # L weight sets rotated across loop iterations (benchmark_loop
    # ``rotated``): a single loop-invariant weight gets hoisted into VMEM
    # and marginal iterations then measure compute-only bandwidth the
    # serving path never sees (round-2 published a 9890 GB/s dense row
    # that way). L is sized so each operand stack exceeds 2x VMEM.
    min_bytes = 2 * 2 * 16 * 1024 * 1024
    L = max(2, -(-min_bytes // (args.k * args.n // 2)))
    w = r.normal(size=(L, args.k, args.n)).astype(np.float32) * 0.02
    w_qs = [quantize_weights(w[i], qt, args.group_size) for i in range(L)]
    packed = jnp.asarray(np.stack([pack_rows(q[1], args.bits) for q in w_qs]))
    packed_planar = jnp.asarray(
        np.stack([pack_rows_planar(q[1], args.bits, args.group_size) for q in w_qs])
    )
    scales = jnp.asarray(np.stack([q[2] for q in w_qs]), dtype=jnp.bfloat16)
    x = jnp.asarray(r.normal(size=(args.m, args.k)), dtype=jnp.bfloat16)
    w_dense = jnp.asarray(w, dtype=jnp.bfloat16)

    import jax
    dense = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32).astype(a.dtype))

    packed_magic = None
    if args.bits == 4 and args.k % args.group_size == 0 and args.group_size % 8 == 0:
        packed_magic = jnp.asarray(
            np.stack([pack_rows_magic(q[1], args.bits, args.group_size) for q in w_qs])
        )

    out_bytes = args.m * args.n * 2
    per_packed = packed.nbytes // L + scales.nbytes // L + x.nbytes + out_bytes
    per_planar = packed_planar.nbytes // L + scales.nbytes // L + x.nbytes + out_bytes

    # Zero-copy rotation via the stacked scalar-prefetch path (the model's
    # own configuration): the kernel indexes layer i % L straight out of
    # the (L, ...) stack, so there is no dynamic-slice materialization
    # depressing the row (exp_lmhead_r4b.log: 816 vs 201 GB/s). Falls back
    # to sliced rotation when the shape has no pad-free tiling.
    import jax

    def stacked_case(tag, pk, sc, layout, nbytes):
        def step(carry, i, x, pk, sc):
            return mixed_precision_gemm(
                x + carry, pk, sc, None, args.bits, qt.bias, args.group_size,
                layout=layout, layer_index=i % L)
        try:
            jax.eval_shape(lambda x, pk, sc: step(jnp.float32(0), jnp.int32(0), x, pk, sc), x, pk, sc)
        except ValueError:
            return (tag,
                    lambda carry, x, pkl, scl: mixed_precision_gemm(
                        x + carry, pkl, scl, None, args.bits, qt.bias, args.group_size,
                        layout=layout),
                    nbytes, (x,), None, (pk, sc))
        return (tag, step, nbytes, (x, pk, sc), None, (), True)

    magic_cases = []
    if packed_magic is not None:
        magic_cases = [stacked_case(
            f"mixed_gemm_w{args.bits}a16_m{args.m}_magic",
            packed_magic, scales, "magic", per_planar)]
    run_and_report(args, [
        *magic_cases,
        stacked_case(f"mixed_gemm_w{args.bits}a16_m{args.m}", packed, scales, "gptq", per_packed),
        stacked_case(
            f"mixed_gemm_w{args.bits}a16_m{args.m}_planar",
            packed_planar, scales, "planar", per_planar),
        ("dense_bf16_matmul",
         lambda carry, x, wd: dense(x + carry, wd),
         w_dense.nbytes // L + x.nbytes + out_bytes, (x,), None, (w_dense,)),
    ])


if __name__ == "__main__":
    main()
