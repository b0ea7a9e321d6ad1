# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Round-4 lm_head probe: why does the magic kernel hit only ~220 GB/s on
(K=4096, N=129024) when the same kernel sustains ~410 GB/s on the MLP
shape (N=14336)?

Sweeps tile geometry on the REAL lm_head shape with the shipped launcher
(block_k/block_n overrides), including a single-k-step bk=4096 variant
that removes the k-grid entirely, plus a dense bf16 anchor for the
window. All rows use the robust differenced timer.
"""

from __future__ import annotations

import functools
import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.kernels.quantization.gemm import mixed_precision_gemm_launcher
from conch_tpu.utils.benchmark import robust_diff_time

M, K, N, GS = 8, 4096, 129024, 128
L = 4  # rotated weight stacks (4 x 272 MB packed)
ITERS = 12


def bench(tag, fn, args, bytes_per, iters=ITERS):
    run = jax.jit(functools.partial(fn, iters=2), static_argnums=())
    run_big = jax.jit(functools.partial(fn, iters=2 + iters))
    _ = np.asarray(run(*args))
    _ = np.asarray(run_big(*args))
    per, ok = robust_diff_time(
        lambda: np.asarray(run(*args)),
        lambda: np.asarray(run_big(*args)),
        iters * L,
    )
    flag = "" if ok else "  [unstable]"
    print(
        f"{tag:28s} {per*1e3:8.4f} ms/gemm  {bytes_per/per/1e9:7.1f} GB/s  "
        f"{K*N/per/1e9:7.1f} Gel/s{flag}",
        flush=True,
    )


def main():
    rng = np.random.default_rng(0)
    print("prep ...", flush=True)
    packed = jnp.asarray(
        rng.integers(-(2**31), 2**31 - 1, size=(L, K // 8, N), dtype=np.int64).astype(np.int32)
    )
    scales = jnp.asarray(rng.random((L, K // GS, N), dtype=np.float32) * 0.01, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    bytes_per = packed.nbytes // L + scales.nbytes // L

    # dense anchor: L stacks won't fit (129024*4096*2 = 1.06 GB each); use 2
    dense = jnp.asarray(rng.standard_normal((2, K, N // 8)), jnp.bfloat16)

    def dense_fn(x, w, iters):
        def outer(x, _):
            def body(x, wl):
                y = jnp.dot(x, wl, preferred_element_type=jnp.float32)
                return x + y[:, :K].astype(x.dtype) * 1e-6, ()
            x, _ = jax.lax.scan(body, x, w)
            return x, ()
        x, _ = jax.lax.scan(outer, x, None, length=iters)
        return x

    run_d = jax.jit(functools.partial(dense_fn, iters=2))
    run_d_big = jax.jit(functools.partial(dense_fn, iters=2 + ITERS))
    _ = np.asarray(run_d(x, dense)); _ = np.asarray(run_d_big(x, dense))
    per, ok = robust_diff_time(
        lambda: np.asarray(run_d(x, dense)),
        lambda: np.asarray(run_d_big(x, dense)),
        ITERS * 2,
    )
    print(
        f"{'dense_bf16_N/8':28s} {per*1e3:8.4f} ms/gemm  {dense.nbytes/2/per/1e9:7.1f} GB/s"
        f"{'' if ok else '  [unstable]'}",
        flush=True,
    )

    def make(bk, bn):
        def fn(x, pk, sc, iters):
            def outer(x, _):
                def body(x, w):
                    y = mixed_precision_gemm_launcher(
                        x, w[0], w[1], None, weight_size_bits=4, weight_bias=8,
                        group_size=GS, layout="magic", block_k=bk, block_n=bn,
                    )
                    return x + y[:, :K].astype(x.dtype) * 1e-6, ()
                x, _ = jax.lax.scan(body, x, (pk, sc))
                return x, ()
            x, _ = jax.lax.scan(outer, x, None, length=iters)
            return x
        return fn

    for bk, bn in [
        (2048, 7168),   # current default pick
        (2048, 3584),
        (1024, 7168),
        (1024, 3584),
        (4096, 3584),   # single k step
        (4096, 2048),
        (2048, 2048),
        (1024, 2016),   # 129024 = 2016*64; non-pow2 lane tile
    ]:
        if N % bn != 0 or K % bk != 0:
            print(f"skip bk{bk}/bn{bn} (not dividing)", flush=True)
            continue
        try:
            bench(f"magic_bk{bk}_bn{bn}", make(bk, bn), (x, packed, scales), bytes_per)
        except Exception as e:  # noqa: BLE001
            print(f"magic_bk{bk}_bn{bn} FAILED: {type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
