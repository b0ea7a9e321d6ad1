# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Round-4b lm_head diagnosis: every tile geometry lands at ~221 GB/s on
(K=4096, N=129024) while the identical kernel sustains ~406 GB/s on the
MLP shape — geometry-independent, so the loss is OUTSIDE the kernel grid.

Suspect: the benchmark (and the model's layer scan) feeds the pallas_call
a lax.scan slice of an (L, K/8, N) stack; if XLA materializes the 264 MB
slice, traffic triples (slice read + copy write + kernel read), which
matches 775 / 3.4 ~= 228 GB/s. Differential rows:

  dma_roofline  : pallas copy kernel over one packed buffer (window ceiling)
  magic_noscan  : weight passed DIRECT to the kernel (no stack, no slice),
                  repeats via an outer scan over the same buffer
  magic_scanL2  : lax.scan over an (2, K/8, N) stack (the r4 pattern)
  magic_hbmgrid : weight direct, in_spec memory_space=ANY with manual copy
                  (same as shipped kernel; sanity duplicate)
"""

from __future__ import annotations

import functools
import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.kernels.quantization.gemm import mixed_precision_gemm_launcher
from conch_tpu.utils.benchmark import robust_diff_time

M, K, N, GS = 8, 4096, 129024, 128
ITERS = 12
BK, BN = 2048, 7168


def timed(tag, make_run, bytes_per, reps):
    run_small = make_run(2)
    run_big = make_run(2 + reps)
    _ = np.asarray(run_small())
    _ = np.asarray(run_big())
    per, ok = robust_diff_time(
        lambda: np.asarray(run_small()), lambda: np.asarray(run_big()), reps
    )
    flag = "" if ok else "  [unstable]"
    print(
        f"{tag:16s} {per*1e3:8.4f} ms/it  {bytes_per/per/1e9:7.1f} GB/s  "
        f"{K*N/per/1e9:7.1f} Gel/s{flag}",
        flush=True,
    )


def copy_kernel(s_ref, x_ref, o_ref):
    o_ref[...] = x_ref[...] + s_ref[0]


def main():
    rng = np.random.default_rng(0)
    print("prep ...", flush=True)
    packed1 = jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, size=(K // 8, N), dtype=np.int64).astype(np.int32)
    )
    scales1 = jnp.asarray(rng.random((K // GS, N), dtype=np.float32) * 0.01, jnp.bfloat16)
    packed2 = jnp.stack([packed1, packed1 + 1])
    scales2 = jnp.stack([scales1, scales1])
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    bytes_per = packed1.nbytes + scales1.nbytes

    # 0. pure DMA roofline over the packed buffer
    def make_copy(iters):
        @jax.jit
        def run_inner(pk1):
            def body(c, _):
                out = pl.pallas_call(
                    copy_kernel,
                    out_shape=jax.ShapeDtypeStruct(packed1.shape, packed1.dtype),
                    grid=(4, N // BN),
                    in_specs=[
                        pl.BlockSpec(memory_space=pltpu.SMEM),
                        pl.BlockSpec((K // 32, BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                    ],
                    out_specs=pl.BlockSpec((K // 32, BN), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                )(c.astype(jnp.int32).reshape(1), pk1)
                return c + out[0, 0].astype(jnp.float32) * 1e-30, ()
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
            return c
        return lambda: run_inner(packed1)

    timed("dma_roofline", make_copy, 2 * packed1.nbytes, ITERS)

    def gemm(x, pk, sc):
        return mixed_precision_gemm_launcher(
            x, pk, sc, None, weight_size_bits=4, weight_bias=8,
            group_size=GS, layout="magic", block_k=BK, block_n=BN,
        )

    # 1. direct weight, no stack slicing
    def make_noscan(iters):
        @jax.jit
        def run_inner(x, pk, sc):
            def body(c, _):
                y = gemm(x + c, pk, sc)
                return c + y[0, 0].astype(jnp.bfloat16) * 1e-30, ()
            c, _ = jax.lax.scan(body, jnp.bfloat16(0), None, length=iters)
            return c
        return lambda: run_inner(x, packed1, scales1)

    timed("magic_noscan", make_noscan, bytes_per, ITERS)

    # 2. scan over a 2-stack (the r4 benchmark + model pattern)
    def make_scan(iters):
        @jax.jit
        def run_inner(x, pk2, sc2):
            def outer(c, _):
                def body(c, w):
                    y = gemm(x + c, w[0], w[1])
                    return c + y[0, 0].astype(jnp.bfloat16) * 1e-30, ()
                c, _ = jax.lax.scan(body, c, (pk2, sc2))
                return c, ()
            c, _ = jax.lax.scan(outer, jnp.bfloat16(0), None, length=iters)
            return c
        return lambda: run_inner(x, packed2, scales2)

    timed("magic_scanL2", make_scan, bytes_per, ITERS * 2)

    # 3. indexed gather from the stack WITHOUT scan (dynamic_index_in_dim)
    def make_dynslice(iters):
        @jax.jit
        def run_inner(x, pk2, sc2):
            def body(c, i):
                pk = jax.lax.dynamic_index_in_dim(pk2, i % 2, 0, keepdims=False)
                sc = jax.lax.dynamic_index_in_dim(sc2, i % 2, 0, keepdims=False)
                y = gemm(x + c, pk, sc)
                return c + y[0, 0].astype(jnp.bfloat16) * 1e-30, ()
            c, _ = jax.lax.scan(body, jnp.bfloat16(0), jnp.arange(iters, dtype=jnp.int32))
            return c
        return lambda: run_inner(x, packed2, scales2)

    timed("magic_dynslice", make_dynslice, bytes_per, ITERS)


if __name__ == "__main__":
    main()
