# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Tile sweep for the fused decode GEMM shapes (round 5).

exp_decode_profile_r5: wo (K4096,N4096) measured 353 GB/s and gateup
(K4096,N28672) 605 GB/s while down (K14336,N4096) hits 735 — hypothesis:
the default bk=2048 leaves wo/gateup with only 2 K-steps per (i,j) tile,
too few for the double-buffered weight DMA to reach steady state. Sweep
bk x bn per shape, m=8, magic layout, stacked L with zero-copy index
rotation (pass_index) — same harness as the decode profile rows.
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

B, GS = 8, 128

SHAPES = [
    ("wo", 4096, 4096),
    ("gateup", 4096, 28672),
    ("wqkv", 4096, 6144),
]
BKS = [512, 1024, 2048]
BNS = [2048, 4096, 6144, 7168]


def main() -> None:
    rng = np.random.default_rng(0)
    for name, K, N in SHAPES:
        L = max(2, min(8, (2 << 30) // (K * N // 2)))
        packed = jnp.asarray(
            rng.integers(-(2**31), 2**31 - 1, size=(L, K // 8, N), dtype=np.int64).astype(np.int32)
        )
        scales = jnp.asarray(rng.random((L, K // GS, N), dtype=np.float32) * 0.01, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)
        for bk in BKS:
            if K % bk:
                continue
            for bn in BNS:
                if N % bn:
                    continue

                @functools.partial(jax.jit, static_argnames=("iters",))
                def run(x, pk, sc, iters, bk=bk, bn=bn):
                    def outer(x, _):
                        def body(x, li):
                            y = mixed_precision_gemm_launcher(
                                x, pk, sc, None, weight_size_bits=4, weight_bias=8,
                                group_size=GS, layout="magic", layer_index=li,
                                block_k=bk, block_n=bn,
                            )
                            nf = min(K, N)
                            return x.at[:, :nf].add(y[:, :nf].astype(x.dtype) * 1e-6), ()
                        x, _ = jax.lax.scan(body, x, jnp.arange(pk.shape[0], dtype=jnp.int32))
                        return x, ()
                    x, _ = jax.lax.scan(outer, x, None, length=iters)
                    return x

                I = 24
                try:
                    _ = np.asarray(run(x, packed, scales, iters=2))
                    _ = np.asarray(run(x, packed, scales, iters=2 + I))
                except Exception as e:  # noqa: BLE001 — VMEM OOM rows reported, not fatal
                    print(f"{name} bk{bk} bn{bn}: FAILED {type(e).__name__}", flush=True)
                    continue
                per, ok = robust_diff_time(
                    lambda: np.asarray(run(x, packed, scales, iters=2)),
                    lambda: np.asarray(run(x, packed, scales, iters=2 + I)),
                    I * L,
                )
                gbps = (packed.nbytes // L + scales.nbytes // L) / per / 1e9
                flag = "" if ok else "  [unstable]"
                print(f"{name} bk{bk} bn{bn}: {per*1e3:8.4f} ms  {gbps:7.1f} GB/s{flag}", flush=True)


if __name__ == "__main__":
    main()
