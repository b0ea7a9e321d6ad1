# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Round-4 int4 decode-GEMM experiment: find the real bound, then beat it.

Hypotheses from the round-3 logs (which disagreed by 2x between windows):
  H1  the kernel is MXU weight-load-rate bound (~1000 Gel/s at small m),
      so unpack cost is hidden -> nodequant ~= planar at equal tiles.
  H2  the kernel is VPU unpack-bound -> the magic-constant bf16 unpack
      (bitcast 0x4300|nibble, ~1.4 ops/elem, no convert) wins ~2x.
  H3  the int8 MXU path has 2x the element rate -> a W4A8 mode is the
      way past the bf16-MXU bound.
  H4  element rate is m-independent for m in {8..128} (weight-stationary
      load dominates) -> padding m is free but useless.

Every row reports ms/GEMM, implied GB/s, and G-elements/s with the
robust differenced timer (negatives re-measured, agreement required).
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
from conch_tpu.kernels.common import round_up, use_interpret_mode
from conch_tpu.utils.benchmark import robust_diff_time
from conch_tpu.utils.quant_utils import pack_rows_planar

M, K, N, L, GS = 8, 4096, 14336, 8, 128
ITERS = 32


def pack_rows_magic(codes: np.ndarray, group_size: int = 128) -> np.ndarray:
    """Pack uint4 codes (K, N) for the magic bf16 bitcast unpack.

    Within each K-group, logical row ``l`` lands in word row ``(l % 32) // 2``
    of field ``l // 32`` (bit offset ``4*(l//32) + 16*(l % 2)``), so the
    kernel's per-field ``(w >> 4j) & 0x000F000F | 0x43004300`` bitcast
    reproduces rows in order after a 4-slab sublane concatenation.
    """
    k_dim, n_dim = codes.shape
    assert k_dim % group_size == 0 and group_size % 8 == 0
    rpg = group_size // 8  # word rows per group
    words = np.zeros((k_dim // 8, n_dim), np.uint32)
    spg = group_size // 4  # logical rows per field slab
    for g in range(k_dim // group_size):
        for l in range(group_size):
            j, o = l // spg, l % spg
            r, h = o // 2, o % 2
            words[g * rpg + r] |= (codes[g * group_size + l].astype(np.uint32) & 0xF) << (
                4 * j + 16 * h
            )
    return words.view(np.int32)


def _variant_kernel(x_ref, b_ref, s_ref, o_ref, acc_ref, *, mode, bk, bn, num_k):
    nbits, epp = 4, 8
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mask = (1 << nbits) - 1
    gpt = bk // GS
    rpg = GS // epp
    x = x_ref[...]
    packed = b_ref[...]
    if mode == "nodequant":
        w = packed.astype(jnp.bfloat16)
        part = jnp.dot(x[:, : bk // epp], w, preferred_element_type=jnp.float32)
        acc_ref[...] += part
    elif mode == "planar":
        for g in range(gpt):
            pw = packed[g * rpg : (g + 1) * rpg]
            fields = [jax.lax.shift_right_logical(pw, nbits * i) & mask for i in range(epp)]
            codes = jnp.concatenate(fields, axis=0)
            xg = x[:, g * GS : (g + 1) * GS]
            part = jnp.dot(xg, codes.astype(x.dtype), preferred_element_type=jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            sg = s_ref[g].astype(jnp.float32)
            acc_ref[...] += (part - 8.0 * xsum) * sg
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
            codes = jnp.concatenate(slabs, axis=0)  # (GS, bn) bf16 = 128 + n
            xg = x[:, g * GS : (g + 1) * GS]
            part = jnp.dot(xg, codes, preferred_element_type=jnp.float32)
            xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
            sg = s_ref[g].astype(jnp.float32)
            acc_ref[...] += (part - 136.0 * xsum) * sg  # 136 = magic 128 + bias 8
    elif mode == "magic_onedot":
        # one (bm, bk) @ (bk, bn) dot per K-tile; scales pre-multiplied
        # into x is impossible (per-group x N), so fold scale into codes
        # post-unpack instead: 1 extra VPU multiply per element.
        slabs_all = []
        for g in range(gpt):
            pw = packed[g * rpg : (g + 1) * rpg]
            sg = s_ref[g].astype(jnp.bfloat16)
            for j in range(4):
                t = pltpu.bitcast(
                    (jax.lax.shift_right_logical(pw, 4 * j) & jnp.int32(0x000F000F))
                    | jnp.int32(0x43004300),
                    jnp.bfloat16,
                )
                slabs_all.append((t - jnp.bfloat16(136.0)) * sg)
        w = jnp.concatenate(slabs_all, axis=0)  # (bk, bn) dequantized
        acc_ref[...] += jnp.dot(x, w, preferred_element_type=jnp.float32)

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("mode", "bk", "bn", "bm"))
def variant(x, packed, scales, *, mode, bk=1024, bn=2048, bm=16):
    mp = round_up(M, bm)
    x = jnp.pad(x, ((0, mp - x.shape[0]), (0, 0)))
    grid = (mp // bm, N // bn, K // bk)
    gpt = bk // GS
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        pl.BlockSpec((bk // 8, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
        pl.BlockSpec((gpt, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, packed, scales.reshape(K // GS, 1, N)]
    out = pl.pallas_call(
        functools.partial(_variant_kernel, mode=mode, bk=bk, bn=bn, num_k=K // bk),
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


def bench(tag, fn, weights_tree, bytes_per_gemm, elements=K * N):
    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x, wt, iters):
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
    el = elements / per / 1e9
    flag = "" if ok else "  [unstable]"
    print(f"{tag:24s} {per*1e3:8.4f} ms/gemm  {gbps:7.1f} GB/s  {el:7.1f} Gel/s{flag}", flush=True)


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(L, K, N), dtype=np.uint8)
    scales = (rng.random((L, K // GS, N), dtype=np.float32) * 0.01 + 0.005).astype(np.float32)
    packed_j = jnp.asarray(np.stack([pack_rows_planar(codes[i], 4, GS) for i in range(L)]))
    magic_j = jnp.asarray(np.stack([pack_rows_magic(codes[i], GS) for i in range(L)]))
    scales_j = jnp.asarray(scales, jnp.bfloat16)
    dense_j = jnp.asarray(
        (codes.astype(np.float32) - 8) * np.repeat(scales, GS, axis=1), jnp.bfloat16
    )
    w8_j = jnp.asarray(rng.integers(-127, 127, size=(L, K, N), dtype=np.int64), jnp.int8)

    pk_bytes = packed_j[0].nbytes + scales_j[0].nbytes

    # correctness check of the magic kernel vs the planar launcher
    x0 = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    want = mixed_precision_gemm_launcher(
        x0, packed_j[0], scales_j[0], None, weight_size_bits=4, weight_bias=8,
        group_size=GS, layout="planar",
    )
    got = variant(x0, magic_j[0], scales_j[0], mode="magic")
    err = float(jnp.max(jnp.abs(want.astype(jnp.float32) - got.astype(jnp.float32))))
    rel = err / float(jnp.max(jnp.abs(want.astype(jnp.float32))))
    print(f"magic kernel max abs err vs planar launcher: {err:.4e} (rel {rel:.2e})", flush=True)

    bench(
        "dense_bf16",
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        dense_j,
        dense_j[0].nbytes,
    )
    bench(
        "int8_dense_xla",
        lambda x, w: jnp.dot(
            jnp.round(x * 4).astype(jnp.int8), w, preferred_element_type=jnp.int32
        ).astype(jnp.bfloat16),
        w8_j,
        w8_j[0].nbytes,
    )
    bench(
        "planar_current",
        lambda x, w: mixed_precision_gemm_launcher(
            x, w[0], w[1], None, weight_size_bits=4, weight_bias=8, group_size=GS,
            layout="planar",
        ),
        (packed_j, scales_j),
        pk_bytes,
    )
    for bm in (8, 16, 32, 128):
        bench(
            f"planar_bm{bm}",
            lambda x, w, bm=bm: variant(x, w[0], w[1], mode="planar", bm=bm),
            (packed_j, scales_j),
            pk_bytes,
        )
    bench(
        "nodequant",
        lambda x, w: variant(x, w[0], w[1], mode="nodequant"),
        (packed_j, scales_j),
        pk_bytes,
    )
    for bm in (8, 16, 32):
        bench(
            f"magic_bm{bm}",
            lambda x, w, bm=bm: variant(x, w[0], w[1], mode="magic", bm=bm),
            (magic_j, scales_j),
            pk_bytes,
        )
    bench(
        "magic_onedot",
        lambda x, w: variant(x, w[0], w[1], mode="magic_onedot"),
        (magic_j, scales_j),
        pk_bytes,
    )
    for bn in (1024, 3584, 7168):
        bench(
            f"magic_bn{bn}",
            lambda x, w, bn=bn: variant(x, w[0], w[1], mode="magic", bn=bn),
            (magic_j, scales_j),
            pk_bytes,
        )
    for bk in (512, 2048):
        bench(
            f"magic_bk{bk}",
            lambda x, w, bk=bk: variant(x, w[0], w[1], mode="magic", bk=bk),
            (magic_j, scales_j),
            pk_bytes,
        )


if __name__ == "__main__":
    main()
