# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Round-4 bnb codec bottleneck hunt (v2, against the reshape-free kernels).

The original Pallas codecs never compiled on real Mosaic (the in-kernel 3D
``(bt, k, bs)`` reshape hits "infer-vector-layout: unsupported shape
cast"); the shipped kernels are now roll-based (blockwise.py). This probe
phase-isolates the rewritten quantize/dequantize at 16M elements, bs=64:

  copy_roofline : pallas read+write same bytes, no compute (harness ceiling)
  q_launcher    : shipped quantize_blockwise op (XLA pre/post included)
  q_norolls     : roll-absmax replaced by a fake (isolates 24 roll/max ops)
  q_noencode    : encode replaced by a cast (isolates the 15-compare tree)
  q_nopack      : raw codes stored at full width (isolates the MXU pack dot)
  q_noamout     : absmax extract dot + narrow store skipped
  d_launcher    : shipped dequantize_blockwise
  d_nointerleave: skip the MXU even/odd scatter (wrong values, right traffic)
  d_nodecode    : decode tree replaced by a cast
  d_noam        : absmax expand dot + scale skipped
Every row is failure-isolated; all rows use the robust differenced timer.
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
from conch_tpu.kernels.quantization.bitsandbytes import blockwise as bw
from conch_tpu.utils.benchmark import robust_diff_time

import argparse

_p = argparse.ArgumentParser()
_p.add_argument("--numel", type=int, default=16 * 1024 * 1024)
_p.add_argument("--iters", type=int, default=16)
_a = _p.parse_args()
NUMEL = _a.numel
BS = 64
L = 4  # rotated operand stacks
ITERS = _a.iters


def bench(tag, fn, xs, bytes_per, iters=ITERS):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(xs, n):
        def outer(c, _):
            def body(c, x):
                r = fn(x)
                leaf = jax.tree.leaves(r)[0]
                return c + leaf.reshape(-1)[:1].astype(jnp.float32) * 1e-9, ()
            c, _ = jax.lax.scan(body, c, xs)
            return c, ()
        c, _ = jax.lax.scan(outer, jnp.zeros((1,), jnp.float32), None, length=n)
        return c

    try:
        _ = np.asarray(run(xs, n=1)); _ = np.asarray(run(xs, n=1 + iters // L))
        per, ok = robust_diff_time(
            lambda: np.asarray(run(xs, n=1)),
            lambda: np.asarray(run(xs, n=1 + iters // L)),
            (iters // L) * L,
        )
    except Exception as e:  # noqa: BLE001
        print(f"{tag:16s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        return
    flag = "" if ok else "  [unstable]"
    print(f"{tag:16s} {per*1e3:8.4f} ms  {bytes_per/per/1e9:7.1f} GB/s{flag}", flush=True)


def variant_quant_kernel(x_ref, packed_ref, am_ref, *, bs, k, mode):
    bt, w = x_ref.shape
    x = x_ref[...].astype(jnp.float32)
    if mode == "norolls":
        am_wide = jnp.abs(x) + 1.0  # wrong, data-dependent, no rolls
    else:
        am_wide = bw._roll_absmax_wide(x, bs)
    scaled = x * jnp.where(am_wide > 0.0, 1.0 / am_wide, 0.0)
    if mode == "noencode":
        codes = jnp.clip(scaled.astype(jnp.int32) + 8, 0, 15)
    else:
        codes = bw._nf4_encode(scaled)
    if mode == "nopack":
        packed_ref[...] = (
            jnp.clip(codes[:, : w // 2] + codes[:, w // 2 :] * 16, 0, 255)
            .astype(jnp.int32).astype(jnp.uint8)
        )
    else:
        packmat = bw._pack_matrix_iota(w)
        packed = jnp.dot(codes.astype(jnp.bfloat16), packmat, preferred_element_type=jnp.float32)
        packed_ref[...] = packed[:, : w // 2].astype(jnp.int32).astype(jnp.uint8)
    if mode == "noamout":
        am_ref[...] = am_wide[:, : am_ref.shape[1]]  # no extract dot
        return
    ext = bw._extract_matrix_iota(w, bs)
    am = jnp.dot(am_wide.astype(jnp.bfloat16), ext, preferred_element_type=jnp.float32)
    am_ref[...] = am[:, :k]


def make_quant_variant(mode, bt_override=None):
    def fn(x):
        flat = x.reshape(-1)
        bt, w, k = bw._work_geometry(BS)
        if bt_override:
            bt = bt_override
        rows = -(-(NUMEL // BS) // k)
        rows_pad = round_up(rows, bt)
        x2 = flat.reshape(rows_pad, w)
        packed, am = pl.pallas_call(
            functools.partial(variant_quant_kernel, bs=BS, k=k, mode=mode),
            out_shape=(
                jax.ShapeDtypeStruct((rows_pad, w // 2), jnp.uint8),
                jax.ShapeDtypeStruct((rows_pad, k), jnp.float32),
            ),
            grid=(rows_pad // bt,),
            in_specs=[pl.BlockSpec((bt, w), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=(
                pl.BlockSpec((bt, w // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ),
            interpret=use_interpret_mode(),
        )(x2)
        return packed
    return fn


def variant_deq_kernel(p_ref, am_ref, out_ref, *, bs, k, mode):
    bt = p_ref.shape[0]
    w = out_ref.shape[1]
    p = p_ref[...].astype(jnp.int32)
    hi = (p >> 4).astype(jnp.bfloat16)
    lo = (p & 0x0F).astype(jnp.bfloat16)
    if mode == "nointerleave":
        codes = jnp.concatenate([hi, lo], axis=1).astype(jnp.int32)  # wrong order, same traffic
    else:
        e, o = bw._unpack_matrices_iota(w)
        cf = jnp.dot(hi, e, preferred_element_type=jnp.float32)
        cf += jnp.dot(lo, o, preferred_element_type=jnp.float32)
        codes = cf[:, :w].astype(jnp.int32)
    if mode == "nodecode":
        values = codes.astype(jnp.float32) * 0.066 - 0.5
    else:
        values = bw._nf4_decode(codes)
    if mode == "noam":
        out_ref[...] = values.astype(out_ref.dtype)  # wrong values, right traffic
        return
    am = am_ref[...].astype(jnp.float32)
    exp = bw._expand_matrix_iota(k, w)
    am_wide = sum(
        jnp.dot(t, exp, preferred_element_type=jnp.float32)
        for t in bw._split_bf16_terms(am, True)
    )
    out_ref[...] = (values * am_wide).astype(out_ref.dtype)


def make_deq_variant(mode):
    def fn(arg):
        packed, absmax = arg
        bt, w, k = bw._work_geometry(BS)
        rows_pad = round_up(-(-(NUMEL // BS) // k), bt)
        out = pl.pallas_call(
            functools.partial(variant_deq_kernel, bs=BS, k=k, mode=mode),
            out_shape=jax.ShapeDtypeStruct((rows_pad, w), jnp.bfloat16),
            grid=(rows_pad // bt,),
            in_specs=[
                pl.BlockSpec((bt, w // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((bt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bt, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=use_interpret_mode(),
        )(packed.reshape(rows_pad, w // 2), absmax.reshape(rows_pad, k))
        return out
    return fn


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def main():
    from conch_tpu.ops.quantization.bitsandbytes import dequantize_blockwise, quantize_blockwise

    rng = np.random.default_rng(0)
    print("prep ...", flush=True)
    xs = jnp.asarray(rng.normal(size=(L, NUMEL)), jnp.bfloat16)
    q_bytes = NUMEL * 2 + NUMEL // 2 + NUMEL // BS * 4

    bt, w, k = bw._work_geometry(BS)
    rows_pad = round_up(-(-(NUMEL // BS) // k), bt)
    packed_s = jnp.asarray(rng.integers(0, 256, size=(L, rows_pad * (w // 2)), dtype=np.int64), jnp.uint8)
    am_s = jnp.asarray(rng.random((L, rows_pad * k), dtype=np.float32))
    d_bytes = NUMEL // 2 + NUMEL // BS * 4 + NUMEL * 2

    def copy_fn(x):
        x2 = x.reshape(-1, 512)
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            grid=(x2.shape[0] // 2048,),
            in_specs=[pl.BlockSpec((2048, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((2048, 512), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=use_interpret_mode(),
        )(x2)

    bench("copy_roofline", copy_fn, xs, NUMEL * 2 * 2)

    bench("q_launcher", lambda x: quantize_blockwise(x, blocksize=BS, quant_type="nf4")[0], xs, q_bytes)
    bench("q_direct", make_quant_variant("full"), xs, q_bytes)
    bench("q_norolls", make_quant_variant("norolls"), xs, q_bytes)
    bench("q_noencode", make_quant_variant("noencode"), xs, q_bytes)
    bench("q_nopack", make_quant_variant("nopack"), xs, q_bytes)
    bench("q_noamout", make_quant_variant("noamout"), xs, q_bytes)
    bench("q_bt2048", make_quant_variant("full", bt_override=2048), xs, q_bytes)

    bench(
        "d_launcher",
        lambda arg: dequantize_blockwise(
            arg[0][: NUMEL // 2], absmax=arg[1][: NUMEL // BS], blocksize=BS,
            quant_type="nf4"),
        (packed_s, am_s), NUMEL // 2 + NUMEL // BS * 4 + NUMEL * 4,  # f32 out
    )
    bench("d_direct", make_deq_variant("full"), (packed_s, am_s), d_bytes)
    bench("d_nointerleave", make_deq_variant("nointerleave"), (packed_s, am_s), d_bytes)
    bench("d_nodecode", make_deq_variant("nodecode"), (packed_s, am_s), d_bytes)
    bench("d_noam", make_deq_variant("noam"), (packed_s, am_s), d_bytes)


if __name__ == "__main__":
    main()
