# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Experiment: where does the int4 dequant-GEMM time go on a real chip?

Times the decode-shaped (m=8) int4 matmul over L stacked layer weights
(total packed bytes >> VMEM, so every iteration truly streams HBM) for
several kernel strategies, reporting ms/GEMM and implied GB/s:

- dense_bf16       : jnp.dot with bf16 weights (bandwidth reference, 2x bytes)
- planar_current   : the shipped planar Pallas kernel
- planar_nodequant : same kernel shape but dot on raw packed words
                     (WRONG numerics; isolates DMA+MXU cost without unpack)
- planar_perfield  : unpack without the sublane concatenate (one dot per
                     bit-field against the matching x slab)
- xla_int4         : weights stored as jnp.int4, per-group batched dot in
                     plain XLA (no Pallas)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.kernels.quantization.gemm import mixed_precision_gemm_launcher
from conch_tpu.kernels.common import round_up, use_interpret_mode
from conch_tpu.utils.quant_utils import pack_rows_planar

M, K, N, L, GS = 8, 4096, 14336, 8, 128
ITERS = 32


def _planar_variant_kernel(x_ref, b_ref, s_ref, *rest, mode, bk, bn, num_k):
    # rest = ([zp_ref,] o_ref, acc_ref) depending on the zp knob
    zp_ref = rest[0] if len(rest) == 3 else None
    o_ref, acc_ref = rest[-2], rest[-1]
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
        # cost probe: raw packed words straight to the MXU (wrong numerics)
        w = packed.astype(jnp.bfloat16)
        part = jnp.dot(x[:, : bk // epp], w, preferred_element_type=jnp.float32)
        acc_ref[...] += part
    elif mode == "int4ref":
        # b_ref is a native (bk, bn) int4 block; Mosaic converts s4->bf16
        w = packed.astype(jnp.bfloat16).reshape(gpt, GS, bn)
        xs = x.reshape(x.shape[0], gpt, GS)
        part = jax.lax.dot_general(
            xs.transpose(1, 0, 2), w, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (gpt, bm, bn); codes are bias-free signed ints already
        sg = s_ref[...].astype(jnp.float32)  # (gpt, 1, bn)
        acc_ref[...] += jnp.sum(part * sg, axis=0)
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
    elif mode == "perfield":
        for g in range(gpt):
            pw = packed[g * rpg : (g + 1) * rpg]
            xsum = jnp.sum(
                x[:, g * GS : (g + 1) * GS].astype(jnp.float32), axis=1, keepdims=True
            )
            part = jnp.zeros_like(acc_ref)
            for i in range(epp):
                field = (jax.lax.shift_right_logical(pw, nbits * i) & mask).astype(
                    jnp.bfloat16
                )
                xi = x[:, g * GS + i * rpg : g * GS + (i + 1) * rpg]
                part += jnp.dot(xi, field, preferred_element_type=jnp.float32)
            sg = s_ref[g].astype(jnp.float32)
            acc_ref[...] += (part - 8.0 * xsum) * sg

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("mode", "bk", "bn", "with_cost", "with_zp", "with_slice")
)
def planar_variant(
    x, packed, scales, *, mode, bk=256, bn=256,
    with_cost=False, with_zp=False, with_slice=False,
):
    """Variant kernel with knobs replicating launcher features one by one:
    with_cost  = pass the launcher's CostEstimate
    with_zp    = add the dummy SMEM zero-point operand
    with_slice = pad M inside the jit and slice the output (launcher does both)
    """
    bm = 16
    mp = round_up(M, bm)
    if with_slice:
        x = jnp.pad(x, ((0, mp - x.shape[0]), (0, 0)))
    else:
        x = jnp.pad(x, ((0, mp - M), (0, 0)))
    grid = (mp // bm, N // bn, K // bk)
    gpt = bk // GS
    wspec = (
        pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
        if mode == "int4ref"
        else pl.BlockSpec((bk // 8, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM)
    )
    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
        wspec,
        pl.BlockSpec((gpt, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM),
    ]
    operands = [x, packed, scales.reshape(K // GS, 1, N)]
    if with_zp:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        operands.append(jnp.zeros((1,), dtype=jnp.float32))
    kwargs = {}
    if with_cost:
        kwargs["cost_estimate"] = pl.CostEstimate(
            flops=2 * mp * N * K,
            bytes_accessed=mp * K * 2 + K * N // 8 * 4 + mp * N * 2,
            transcendentals=0,
        )
    out = pl.pallas_call(
        functools.partial(_planar_variant_kernel, mode=mode, bk=bk, bn=bn, num_k=K // bk),
        out_shape=jax.ShapeDtypeStruct((mp, N), jnp.bfloat16),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=use_interpret_mode(),
        **kwargs,
    )(*operands)
    return out[:M]


def bench(tag, fn, weights_tree, bytes_per_gemm, pre=None):
    """Scan over L stacked weights per outer iter; carry defeats hoisting."""

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(x, wt, iters):
        if pre is not None:
            wt = pre(wt)  # one-time transform, amortized over iters*L gemms

        def outer(x, _):
            def body(x, w):
                y = fn(x, w)
                # fold output back into a (M, K) carry so nothing is dead
                x = x + y[:, :K].astype(x.dtype) * 1e-6
                return x, ()

            x, _ = jax.lax.scan(body, x, wt)
            return x, ()

        x, _ = jax.lax.scan(outer, x, None, length=iters)
        return x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    # block_until_ready lies on axon: sync via host readback, and cancel the
    # constant tunnel/dispatch overhead by differencing two iteration counts.
    _ = np.asarray(run(x, weights_tree, iters=2))
    _ = np.asarray(run(x, weights_tree, iters=2 + ITERS))
    import time

    diffs = []
    for rep in range(3):
        # fresh input every call: guards against any result memoization in
        # the tunneled runtime
        xa = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
        t0 = time.perf_counter()
        _ = np.asarray(run(xa, weights_tree, iters=2))
        t1 = time.perf_counter()
        _ = np.asarray(run(xb, weights_tree, iters=2 + ITERS))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    per_gemm = min(diffs) / (ITERS * L)
    gbps = bytes_per_gemm / per_gemm / 1e9
    print(f"{tag:18s} {per_gemm*1e3:8.4f} ms/gemm  {gbps:7.1f} GB/s implied")


def main():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(L, K, N), dtype=np.uint8)
    scales = (rng.random((L, K // GS, N), dtype=np.float32) * 0.01 + 0.005).astype(
        np.float32
    )
    packed = np.stack([pack_rows_planar(codes[i], 4, GS) for i in range(L)])
    packed_j = jnp.asarray(packed)
    scales_j = jnp.asarray(scales, jnp.bfloat16)
    codes_j = jnp.asarray(codes)  # uint8; converted to int4 inside the jit
    # (int4 arrays cannot cross the jit/device_put boundary on this platform)
    dense_j = jnp.asarray(
        (codes.astype(np.float32) - 8)
        * np.repeat(scales, GS, axis=1),
        jnp.bfloat16,
    )

    pk_bytes = packed[0].nbytes + scales[0].nbytes // 2

    bench(
        "dense_bf16",
        lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16),
        dense_j,
        dense_j[0].nbytes,
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
    for tag, kw in [
        ("base", {}),
        ("cost", {"with_cost": True}),
        ("zp", {"with_zp": True}),
        ("slice", {"with_slice": True}),
        ("all3", {"with_cost": True, "with_zp": True, "with_slice": True}),
    ]:
        bench(
            f"planar_1024x2048_{tag}",
            lambda x, w, kw=kw: planar_variant(
                x, w[0], w[1], mode="planar", bk=1024, bn=2048, **kw
            ),
            (packed_j, scales_j),
            pk_bytes,
        )

    def to_int4(c):
        return (c.astype(jnp.int8) - 8).astype(jnp.int4)

    # int4ref variants measured 264-283 GB/s (r3 log): Mosaic's s4->bf16
    # convert path loses to the manual planar unpack; dropped from the sweep.

    def xla_int4(x, w):
        wq, s = w  # (K, N) int4, (K//GS, N) bf16
        xg = x.reshape(M, K // GS, GS).transpose(1, 0, 2)  # (G, M, GS)
        wg = wq.reshape(K // GS, GS, N).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            xg, wg, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32
        )  # (G, M, N)
        out = (part * s[:, None, :].astype(jnp.float32)).sum(0)
        return out.astype(jnp.bfloat16)

    # xla_int4 measured 575.7 GB/s (r3 log); dropped from the sweep.

    # xla_int4_flat measured 266 GB/s (r3 log): materializing the dequantized
    # (K, N) bf16 weight loses to the fused per-group dot; dropped.


if __name__ == "__main__":
    main()
