# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""bnb quantize geometry probe (round 5).

Window anchor first: exp_bnb r4/r5 windows consistently report a
~220-250 GB/s Pallas COPY ceiling on the codec's (rows, 512) bf16
working shape while the same chip calibrates 650-800 GB/s on wide
streaming reads — is the 512-lane shape itself the ceiling? Sweep:

  copy512/1024/2048 : same-bytes Pallas copy at 512/1024/2048 lanes
  q_w512_bt512      : shipped geometry (_work_geometry: w=512, bt=512)
  q_w1024_bt256     : 16 blocks/row, half the rows
  q_w1024_bt512     : same w, deeper block
  q_w2048_bt128     : 32 blocks/row
  q_w2048_bt256     :

All rows: NF4, bs=64, 16M elements, robust differenced timing.
"""

from __future__ import annotations

import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import conch_tpu.kernels.quantization.bitsandbytes.blockwise as bw
from conch_tpu.kernels.common import use_interpret_mode
from conch_tpu.utils.benchmark import robust_diff_time

NUMEL = 16 * 1024 * 1024
BS = 64
L = 4  # rotated buffers


def bench(tag, fn, xs, nbytes):
    import functools

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(xs, iters):
        def body(c, i):
            out = fn(xs[i % L])
            leaf = jax.tree.leaves(out)[0]
            return c + leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), jnp.arange(iters, dtype=jnp.int32))
        return c

    I = 16
    try:
        float(np.asarray(run(xs, iters=2)))
        float(np.asarray(run(xs, iters=2 + I)))
    except Exception as e:  # noqa: BLE001
        print(f"{tag:18s} FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    per, ok = robust_diff_time(
        lambda: float(np.asarray(run(xs, iters=2))),
        lambda: float(np.asarray(run(xs, iters=2 + I))),
        I,
    )
    flag = "" if ok else "  [unstable]"
    print(f"{tag:18s} {per*1e3:8.4f} ms  {nbytes/per/1e9:7.1f} GB/s{flag}", flush=True)


def copy_kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...]


def make_copy(lanes, bt):
    def fn(x):
        x2 = x.reshape(-1, lanes)
        return pl.pallas_call(
            copy_kernel,
            out_shape=jax.ShapeDtypeStruct(x2.shape, x2.dtype),
            grid=(x2.shape[0] // bt,),
            in_specs=[pl.BlockSpec((bt, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bt, lanes), lambda i: (i, 0), memory_space=pltpu.VMEM),
            interpret=use_interpret_mode(),
        )(x2)
    return fn


# Alternative absmax/recip formulations (full correct outputs):
#   q_maskexpand : recip_wide = sum_g recip_g * mask_g (k broadcasts,
#                  f32-exact) instead of concat + 3-term bf16 MXU dots
#   q_xla_absmax : absmax reduced OUTSIDE the kernel by XLA (reads x
#                  twice, but XLA's minor-dim reduce is near-memcpy)
import functools
from conch_tpu.kernels.common import round_up

def variant_kernel(x_ref, packed_ref, am_ref, *, bs, k, mode):
    bt, w = x_ref.shape
    x = x_ref[...].astype(jnp.float32)
    a = jnp.abs(x)
    ams = [
        jnp.max(a[:, g * bs : (g + 1) * bs], axis=1, keepdims=True) for g in range(k)
    ]
    recip_wide = jnp.zeros((bt, w), jnp.float32)
    for g, am_g in enumerate(ams):
        mask = (jax.lax.broadcasted_iota(jnp.int32, (1, w), 1) // bs) == g
        r_g = jnp.where(am_g > 0.0, 1.0 / am_g, 0.0)
        recip_wide = recip_wide + jnp.where(mask, r_g, 0.0)
    scaled = x * recip_wide
    codes = bw._nf4_encode(scaled)
    packmat = bw._pack_matrix_iota(w)
    packed = jnp.dot(codes.astype(jnp.bfloat16), packmat, preferred_element_type=jnp.float32)
    packed_ref[...] = packed[:, : w // 2].astype(jnp.int32).astype(jnp.uint8)
    am_ref[...] = jnp.concatenate(ams, axis=1)

def am_input_kernel(x_ref, am_ref_in, packed_ref, am_ref, *, bs, k):
    bt, w = x_ref.shape
    x = x_ref[...].astype(jnp.float32)
    am = am_ref_in[...].astype(jnp.float32)  # (bt, k)
    recip = jnp.where(am > 0.0, 1.0 / am, 0.0)
    exp = bw._expand_matrix_iota(k, w)
    recip_wide = sum(
        jnp.dot(t, exp, preferred_element_type=jnp.float32)
        for t in bw._split_bf16_terms(recip, True)
    )
    scaled = x * recip_wide
    codes = bw._nf4_encode(scaled)
    packmat = bw._pack_matrix_iota(w)
    packed = jnp.dot(codes.astype(jnp.bfloat16), packmat, preferred_element_type=jnp.float32)
    packed_ref[...] = packed[:, : w // 2].astype(jnp.int32).astype(jnp.uint8)
    am_ref[...] = am

def make_variant(mode):
    def fn(x):
        bt, w, k = 512, 512, 512 // BS
        rows = -(-(NUMEL // BS) // k)
        rows_pad = round_up(rows, bt)
        x2 = x.reshape(rows_pad, w)
        if mode == "xla_absmax":
            am_pre = jnp.max(
                jnp.abs(x2.astype(jnp.float32)).reshape(rows_pad, k, BS), axis=2
            )
            return pl.pallas_call(
                functools.partial(am_input_kernel, bs=BS, k=k),
                out_shape=(
                    jax.ShapeDtypeStruct((rows_pad, w // 2), jnp.uint8),
                    jax.ShapeDtypeStruct((rows_pad, k), jnp.float32),
                ),
                grid=(rows_pad // bt,),
                in_specs=[
                    pl.BlockSpec((bt, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=(
                    pl.BlockSpec((bt, w // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
                ),
                interpret=use_interpret_mode(),
            )(x2, am_pre)[0]
        return pl.pallas_call(
            functools.partial(variant_kernel, bs=BS, k=k, mode=mode),
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
        )(x2)[0]
    return fn


def main():
    from conch_tpu.ops.quantization.bitsandbytes import quantize_blockwise

    rng = np.random.default_rng(0)
    print("prep ...", flush=True)
    xs = jnp.asarray(rng.normal(size=(L, NUMEL)), jnp.bfloat16)
    q_bytes = NUMEL * 2 + NUMEL // 2 + NUMEL // BS * 4

    for lanes, bt in ((512, 2048), (1024, 1024), (2048, 512)):
        bench(f"copy{lanes}", make_copy(lanes, bt), xs, NUMEL * 2 * 2)

    orig = bw._work_geometry
    try:
        for w, bt in ((512, 512), (1024, 256), (1024, 512), (2048, 128), (2048, 256)):
            bw._work_geometry = lambda blocksize, w=w, bt=bt: (bt, w, w // blocksize)
            bench(
                f"q_w{w}_bt{bt}",
                lambda x: quantize_blockwise(x, blocksize=BS, quant_type="nf4")[0],
                xs,
                q_bytes,
            )
    finally:
        bw._work_geometry = orig

    bench("q_maskexpand", make_variant("maskexpand"), xs, q_bytes)
    bench("q_xla_absmax", make_variant("xla_absmax"), xs, q_bytes)


if __name__ == "__main__":
    main()
