# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Round-4b int4 GEMM: tile geometry x magic unpack x int8-MXU (W4A8).

Follow-ups to exp_int4_gemm_r4.log (clean window, robust timer):
  magic_bm16  733 Gel/s, magic_bn7168 820, nodequant 1043, int8_xla 668.

Questions:
  Q1 how far do bigger tiles take the magic kernel? (bk2048/bn3584,
     bk2048/bn7168, bk4096/bn3584 ...)
  Q2 what is the pure-DMA ceiling at those tiles? (nodequant_bn7168)
  Q3 does skipping the 4-slab concatenate (4 small dots) win? (magic_nocat)
  Q4 does the int8 MXU double the in-kernel element rate? (w4a8_magic:
     int8 x, int4 codes unpacked to int8 via bitcast to int16 pairs)
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

from conch_tpu.kernels.common import round_up, use_interpret_mode
from conch_tpu.utils.benchmark import robust_diff_time
from tools.drive.exp_int4_gemm_r4 import pack_rows_magic

M, K, N, L, GS = 8, 4096, 14336, 8, 128
ITERS = 32


def _kernel(x_ref, b_ref, s_ref, o_ref, acc_ref, *, mode, bk, bn, num_k):
    k = pl.program_id(2)
    gpt = bk // GS
    rpg = GS // 8

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    packed = b_ref[...]

    if mode == "nodequant":
        w = packed.astype(jnp.bfloat16)
        part = jnp.dot(x[:, : bk // 8], w, preferred_element_type=jnp.float32)
        acc_ref[...] += part
    elif mode == "magic":
        for g in range(gpt):
            pw = packed[g * rpg : (g + 1) * rpg]
            slabs = [
                pltpu.bitcast(
                    (jax.lax.shift_right_logical(pw, 4 * j) & jnp.int32(0x000F000F))
                    | jnp.int32(0x43004300),
                    jnp.bfloat16,
                )
                for j in range(4)
            ]
            codes = jnp.concatenate(slabs, axis=0)
            xg = x[:, g * GS : (g + 1) * GS]
            part = jnp.dot(xg, codes, preferred_element_type=jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            sg = s_ref[g].astype(jnp.float32)
            acc_ref[...] += (part - 136.0 * xsum) * sg
    elif mode == "magic_nocat":
        spg = GS // 4  # logical rows per slab
        for g in range(gpt):
            pw = packed[g * rpg : (g + 1) * rpg]
            part = jnp.zeros_like(acc_ref)
            for j in range(4):
                slab = pltpu.bitcast(
                    (jax.lax.shift_right_logical(pw, 4 * j) & jnp.int32(0x000F000F))
                    | jnp.int32(0x43004300),
                    jnp.bfloat16,
                )  # (spg, bn)
                xj = x[:, g * GS + j * spg : g * GS + (j + 1) * spg]
                part += jnp.dot(xj, slab, preferred_element_type=jnp.float32)
            xg = x[:, g * GS : (g + 1) * GS]
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            sg = s_ref[g].astype(jnp.float32)
            acc_ref[...] += (part - 136.0 * xsum) * sg
    elif mode == "w4a8":
        # x is int8; codes unpacked to int8; dot on the int8 MXU path.
        for g in range(gpt):
            pw = packed[g * rpg : (g + 1) * rpg]
            slabs = [
                pltpu.bitcast(
                    jax.lax.shift_right_logical(pw, 4 * j) & jnp.int32(0x000F000F),
                    jnp.int16,
                ).astype(jnp.int8)
                for j in range(4)
            ]
            codes = jnp.concatenate(slabs, axis=0)  # (GS, bn) int8 in [0, 16)
            xg = x[:, g * GS : (g + 1) * GS]
            part = jnp.dot(xg, codes, preferred_element_type=jnp.int32)
            xsum = jnp.sum(xg.astype(jnp.int32), axis=1, keepdims=True)
            sg = s_ref[g].astype(jnp.float32)
            acc_ref[...] += (part - 8 * xsum).astype(jnp.float32) * sg
    elif mode == "int8_dot":
        # pure int8 MXU probe: b_ref is a full (bk, bn) int8 block
        part = jnp.dot(x, packed, preferred_element_type=jnp.int32)
        acc_ref[...] += part.astype(jnp.float32)

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "bk", "bn", "bm"))
def variant(x, packed, scales, *, mode, bk=1024, bn=2048, bm=16):
    mp = round_up(M, bm)
    x = jnp.pad(x, ((0, mp - x.shape[0]), (0, 0)))
    grid = (mp // bm, N // bn, K // bk)
    gpt = bk // GS
    if mode == "int8_dot":
        wspec = pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
    else:
        wspec = pl.BlockSpec((bk // 8, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        wspec,
        pl.BlockSpec((gpt, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, packed, scales.reshape(K // GS, 1, N)]
    out = pl.pallas_call(
        functools.partial(_kernel, mode=mode, bk=bk, bn=bn, num_k=K // bk),
        out_shape=jax.ShapeDtypeStruct((mp, N), jnp.bfloat16),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret_mode(),
    )(*operands)
    return out[:M]


def bench(tag, fn, weights_tree, bytes_per_gemm, x_dtype=jnp.bfloat16):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x, wt, iters):
        def outer(x, _):
            def body(x, w):
                y = fn(x, w)
                if x.dtype == jnp.int8:
                    x = (x + jnp.round(y[:, :K] * 1e-6).astype(jnp.int8)).astype(jnp.int8)
                else:
                    x = x + y[:, :K].astype(x.dtype) * 1e-6
                return x, ()

            x, _ = jax.lax.scan(body, x, wt)
            return x, ()

        x, _ = jax.lax.scan(outer, x, None, length=iters)
        return x

    rng = np.random.default_rng(0)
    if x_dtype == jnp.int8:
        x = jnp.asarray(rng.integers(-100, 100, (M, K)), jnp.int8)
    else:
        x = jnp.asarray(rng.standard_normal((M, K)), x_dtype)
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
    codes = rng.integers(0, 16, size=(L, K, N), dtype=np.uint8)
    scales = (rng.random((L, K // GS, N), dtype=np.float32) * 0.01 + 0.005).astype(np.float32)
    magic_j = jnp.asarray(np.stack([pack_rows_magic(codes[i], GS) for i in range(L)]))
    scales_j = jnp.asarray(scales, jnp.bfloat16)
    dense_j = jnp.asarray(
        (codes.astype(np.float32) - 8) * np.repeat(scales, GS, axis=1), jnp.bfloat16
    )
    w8_j = jnp.asarray(rng.integers(-127, 127, size=(L, K, N), dtype=np.int64), jnp.int8)
    pk_bytes = magic_j[0].nbytes + scales_j[0].nbytes

    # correctness: w4a8 vs integer reference on one layer
    xi = jnp.asarray(rng.integers(-100, 100, (M, K)), jnp.int8)
    got = variant(xi, magic_j[0], scales_j[0], mode="w4a8")
    xf = np.asarray(xi, np.float32)
    want = (xf @ ((codes[0].astype(np.float32) - 8) * np.repeat(scales, GS, axis=1)[0]))
    err = float(np.max(np.abs(np.asarray(got, np.float32) - want)))
    print(f"w4a8 kernel max abs err vs integer ref: {err:.4e} (scale ~{np.abs(want).max():.1f})", flush=True)

    bench("dense_bf16", lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16), dense_j, dense_j[0].nbytes)
    bench("nodequant_bn7168", lambda x, w: variant(x, w[0], w[1], mode="nodequant", bk=1024, bn=7168), (magic_j, scales_j), pk_bytes)
    bench("magic_nocat", lambda x, w: variant(x, w[0], w[1], mode="magic_nocat", bk=1024, bn=2048), (magic_j, scales_j), pk_bytes)
    bench("magic_nocat_bn7168", lambda x, w: variant(x, w[0], w[1], mode="magic_nocat", bk=1024, bn=7168), (magic_j, scales_j), pk_bytes)
    for bk, bn in ((1024, 2048), (1024, 7168), (2048, 3584)):
        bench(
            f"w4a8_bk{bk}_bn{bn}",
            lambda x, w, bk=bk, bn=bn: variant(x, w[0], w[1], mode="w4a8", bk=bk, bn=bn),
            (magic_j, scales_j),
            pk_bytes,
            x_dtype=jnp.int8,
        )
    bench(
        "int8_dot_pallas",
        lambda x, w: variant(x, w[0], w[1], mode="int8_dot", bk=1024, bn=2048),
        (w8_j, scales_j),
        w8_j[0].nbytes,
        x_dtype=jnp.int8,
    )


if __name__ == "__main__":
    main()
