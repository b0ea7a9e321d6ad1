# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Round-4c: is XLA's native-int4 grouped dot the real decode GEMM winner?

The r3 log recorded xla_int4 at 575.7 GB/s implied (= ~1117 Gel/s, above
the measured Pallas DMA ceiling of ~1012) — but with the broken min-diff
timer. Re-measure with the robust timer, and probe whether XLA stores
jnp.int4 packed (2/byte) on this platform (memory_stats delta), which
decides what "implied GB/s" means for it.
"""

from __future__ import annotations

import functools
import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.utils.benchmark import robust_diff_time
from tools.drive.exp_int4_gemm_r4 import pack_rows_magic
from tools.drive.exp_int4_gemm_r4b import variant

M, K, N, L, GS = 8, 4096, 14336, 8, 128
ITERS = 32


def bench(tag, fn, weights_tree, bytes_per_gemm, pre=None):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x, wt, iters):
        if pre is not None:
            wt = pre(wt)

        def outer(x, _):
            def body(x, w):
                y = fn(x, w)
                x = x + y[:, :K].astype(x.dtype) * 1e-6
                return x, ()

            x, _ = jax.lax.scan(body, x, wt)
            return x, ()

        x, _ = jax.lax.scan(outer, x, None, length=iters)
        return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    _ = np.asarray(run(x, weights_tree, iters=2))
    _ = np.asarray(run(x, weights_tree, iters=2 + ITERS))
    per, ok = robust_diff_time(
        lambda: np.asarray(run(x, weights_tree, iters=2)),
        lambda: np.asarray(run(x, weights_tree, iters=2 + ITERS)),
        ITERS * L,
    )
    gbps = bytes_per_gemm / per / 1e9
    el = K * N / per / 1e9
    flag = "" if ok else "  [unstable]"
    print(f"{tag:24s} {per*1e3:8.4f} ms/gemm  {gbps:7.1f} GB/s  {el:7.1f} Gel/s{flag}", flush=True)


def main():
    rng = np.random.default_rng(0)
    print("prep: generating codes/scales ...", flush=True)
    codes = rng.integers(0, 16, size=(L, K, N), dtype=np.uint8)
    scales = (rng.random((L, K // GS, N), dtype=np.float32) * 0.01 + 0.005).astype(np.float32)
    magic_j = jnp.asarray(np.stack([pack_rows_magic(codes[i], GS) for i in range(L)]))
    magic_j.block_until_ready()
    print("prep: magic packed uploaded", flush=True)
    scales_j = jnp.asarray(scales, jnp.bfloat16)
    dense_j = jnp.asarray(
        (codes.astype(np.float32) - 8) * np.repeat(scales, GS, axis=1), jnp.bfloat16
    )
    dense_j.block_until_ready()
    print("prep: dense anchor uploaded", flush=True)
    codes_j = jnp.asarray(codes)  # uint8 on device; to int4 inside jit
    codes_j.block_until_ready()
    print("prep: codes uploaded", flush=True)
    pk_bytes = magic_j[0].nbytes + scales_j[0].nbytes

    # Probe: does materializing an int4 (K, N) array cost K*N/2 bytes or K*N?
    try:
        dev = jax.devices()[0]
        before = dev.memory_stats()["bytes_in_use"]
        w4 = jax.jit(lambda c: (c.astype(jnp.int8) - 8).astype(jnp.int4))(codes_j[0])
        w4.block_until_ready()
        after = dev.memory_stats()["bytes_in_use"]
        print(f"int4 ({K}x{N}) buffer delta: {(after - before) / 1e6:.1f} MB "
              f"(packed would be {K * N / 2 / 1e6:.1f}, unpacked {K * N / 1e6:.1f})", flush=True)
        del w4
    except Exception as e:  # noqa: BLE001
        print(f"memory probe unavailable: {type(e).__name__}: {str(e)[:120]}", flush=True)

    def to_int4(cs):
        return (cs.astype(jnp.int8) - 8).astype(jnp.int4)

    def xla_int4_grouped(x, w):
        wq, s = w  # (K, N) int4, (K//GS, N) bf16
        xg = x.reshape(M, K // GS, GS).transpose(1, 0, 2)  # (G, M, GS)
        wg = wq.reshape(K // GS, GS, N).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            xg, wg, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (G, M, N)
        out = (part * s[:, None, :].astype(jnp.float32)).sum(0)
        return out.astype(jnp.bfloat16)

    def xla_int4_direct(x, w):
        # int4 codes straight into dot_general (XLA converts internally),
        # scales applied via the same grouped batch.
        wq, s = w
        xg = x.reshape(M, K // GS, GS).transpose(1, 0, 2)
        wg = wq.reshape(K // GS, GS, N)
        part = jax.lax.dot_general(
            xg, wg.astype(x.dtype), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return (part * s[:, None, :].astype(jnp.float32)).sum(0).astype(jnp.bfloat16)

    bench(
        "dense_bf16",
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        dense_j,
        dense_j[0].nbytes,
    )
    bench(
        "xla_int4_grouped",
        xla_int4_grouped,
        (codes_j, scales_j),
        K * N // 2 + scales_j[0].nbytes,
        pre=lambda wt: (to_int4(wt[0]), wt[1]),
    )
    bench(
        "xla_int4_direct",
        xla_int4_direct,
        (codes_j, scales_j),
        K * N // 2 + scales_j[0].nbytes,
        pre=lambda wt: (to_int4(wt[0]), wt[1]),
    )
    bench(
        "magic_bk2048_bn7168",
        lambda x, w: variant(x, w[0], w[1], mode="magic", bk=2048, bn=7168),
        (magic_j, scales_j),
        pk_bytes,
    )

    # correctness of xla_int4_grouped vs numpy
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w4 = jax.jit(to_int4)(codes_j[0])
    got = jax.jit(xla_int4_grouped)(x0, (w4, scales_j[0]))
    want = np.asarray(x0, np.float32) @ (
        (codes[0].astype(np.float32) - 8) * np.repeat(np.asarray(scales_j[0], np.float32), GS, axis=0)
    )
    err = float(np.max(np.abs(np.asarray(got, np.float32) - want)))
    print(f"xla_int4_grouped max abs err: {err:.4e} (out scale ~{np.abs(want).max():.2f})", flush=True)


if __name__ == "__main__":
    main()
