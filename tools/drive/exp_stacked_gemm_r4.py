# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Round-4 stacked scalar-prefetch GEMM validation on hardware.

Checks (1) numerics: stacked layer_index path == per-layer non-stacked
calls; (2) perf: a scan over layer indices with the stacked kernel should
run at the direct-feed speed (~800 GB/s on v5e), not the 109-201 GB/s the
scan-slice/dynamic-slice paths measured (exp_lmhead_r4b.log).
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
from conch_tpu.utils.quant_utils import pack_rows_magic

M, K, GS = 8, 4096, 128
ITERS = 16


def run_shape(N, L, check=True):
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(L, K, N), dtype=np.uint8)
    scales = (rng.random((L, K // GS, N), dtype=np.float32) * 0.01 + 0.005)
    packed = jnp.asarray(np.stack([pack_rows_magic(codes[i], 4, GS) for i in range(L)]))
    scales_j = jnp.asarray(scales, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    bytes_per = packed[0].nbytes + scales_j[0].nbytes

    def gemm_stacked(x, pk, sc, li):
        return mixed_precision_gemm_launcher(
            x, pk, sc, None, weight_size_bits=4, weight_bias=8,
            group_size=GS, layout="magic", layer_index=li,
        )

    if check:
        for li in (0, L - 1):
            got = jax.jit(gemm_stacked)(x, packed, scales_j, jnp.int32(li))
            want = jax.jit(
                lambda x, pk, sc: mixed_precision_gemm_launcher(
                    x, pk, sc, None, weight_size_bits=4, weight_bias=8,
                    group_size=GS, layout="magic",
                )
            )(x, packed[li], scales_j[li])
            err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32))))
            ref = float(jnp.max(jnp.abs(want.astype(jnp.float32)))) or 1.0
            print(f"  N={N} layer {li}: max abs err {err:.3e} (rel {err/ref:.2e})", flush=True)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x, pk, sc, iters):
        def outer(c, _):
            def body(c, li):
                y = gemm_stacked(x + c, pk, sc, li)
                return c + y[0, 0].astype(jnp.bfloat16) * 1e-30, ()
            c, _ = jax.lax.scan(body, c, jnp.arange(L, dtype=jnp.int32))
            return c, ()
        c, _ = jax.lax.scan(outer, jnp.bfloat16(0), None, length=iters)
        return c

    _ = np.asarray(run(x, packed, scales_j, iters=1))
    _ = np.asarray(run(x, packed, scales_j, iters=1 + ITERS))
    per, ok = robust_diff_time(
        lambda: np.asarray(run(x, packed, scales_j, iters=1)),
        lambda: np.asarray(run(x, packed, scales_j, iters=1 + ITERS)),
        ITERS * L,
    )
    flag = "" if ok else "  [unstable]"
    print(
        f"stacked_scan N={N:6d} L={L}: {per*1e3:8.4f} ms/gemm  "
        f"{bytes_per/per/1e9:7.1f} GB/s  {K*N/per/1e9:7.1f} Gel/s{flag}",
        flush=True,
    )


def main():
    print("MLP shape ...", flush=True)
    run_shape(14336, 8)
    print("lm_head shape ...", flush=True)
    run_shape(129024, 2)


if __name__ == "__main__":
    main()
