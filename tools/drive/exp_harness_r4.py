# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Is fixed-operand loop timing honest on this chip?

benchmark_loop rotates operands via dynamic_index_in_dim to defeat (a)
XLA hoisting an invariant body out of the loop and (b) VMEM residency of
a reused operand — but the rotation slice is MATERIALIZED before any
pallas_call (exp_lmhead_r4b.log), adding a read+write of the whole
operand per iteration and depressing every published row (the bnb probe's
own copy roofline measured 188-250 GB/s on an ~800 GB/s chip).

Rows (pallas copy kernel, carry consumes output, operand never rotated):
  fixed_64M   : per-iter time of copying a fixed 64 MB buffer. If XLA
                hoisted the invariant custom call, marginal time ~ 0; if
                it promotes the operand to VMEM, implied GB/s >> window.
  fixed_256M  : same with 256 MB (> VMEM, promotion impossible).
  rotated_64M : the old rotated scheme for comparison (pays the slice).
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

from conch_tpu.utils.benchmark import robust_diff_time

ITERS = 24


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def pallas_copy(x2):
    return pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
        grid=(x2.shape[0] // 1024,),
        in_specs=[pl.BlockSpec((1024, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1024, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x2)


def bench_fixed(tag, mb):
    rows = mb * 1024 * 1024 // 2 // 512
    x = jnp.ones((rows, 512), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, n):
        def body(i, c):
            out = pallas_copy(x)
            return c + out[0, 0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    _ = np.asarray(run(x, n=2)); _ = np.asarray(run(x, n=2 + ITERS))
    per, ok = robust_diff_time(
        lambda: np.asarray(run(x, n=2)), lambda: np.asarray(run(x, n=2 + ITERS)), ITERS
    )
    flag = "" if ok else "  [unstable]"
    print(f"{tag:14s} {per*1e3:8.4f} ms/it  {2*x.nbytes/per/1e9:7.1f} GB/s{flag}", flush=True)


def bench_rotated(tag, mb, L=2):
    rows = mb * 1024 * 1024 // 2 // 512
    xs = jnp.ones((L, rows, 512), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(xs, n):
        def body(i, c):
            x = jax.lax.dynamic_index_in_dim(xs, i % L, keepdims=False)
            out = pallas_copy(x)
            return c + out[0, 0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, n, body, jnp.float32(0))

    _ = np.asarray(run(xs, n=2)); _ = np.asarray(run(xs, n=2 + ITERS))
    per, ok = robust_diff_time(
        lambda: np.asarray(run(xs, n=2)), lambda: np.asarray(run(xs, n=2 + ITERS)), ITERS
    )
    flag = "" if ok else "  [unstable]"
    nbytes = xs.nbytes // L
    print(f"{tag:14s} {per*1e3:8.4f} ms/it  {2*nbytes/per/1e9:7.1f} GB/s{flag}", flush=True)


def main():
    bench_fixed("fixed_64M", 64)
    bench_fixed("fixed_256M", 256)
    bench_rotated("rotated_64M", 64)


if __name__ == "__main__":
    main()
