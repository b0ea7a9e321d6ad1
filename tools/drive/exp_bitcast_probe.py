# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Probe: Mosaic semantics of int32 -> bf16 bitcast inside a Pallas kernel.

Determines the row/lane placement of the two bf16 halves of each int32
word — the layout contract a magic-constant (0x4300 | nibble) unpack
kernel must pack weights against. Prints the mapping for a small block.
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


def probe_pltpu_bitcast():
    """pltpu.bitcast (8, 128) int32 -> bf16: what shape, which half where?"""

    def kernel(x_ref, o_ref):
        o_ref[...] = pltpu.bitcast(x_ref[...], jnp.bfloat16)

    # word (r, c) = (low=LO(r,c), high=HI(r,c)) where both halves are
    # bf16 bit patterns of distinct recognizable values.
    def bf16_bits(v):
        return int(np.asarray(v, jnp.bfloat16).view(np.uint16))

    rows, cols = 8, 128
    lo = np.zeros((rows, cols), np.uint32)
    hi = np.zeros((rows, cols), np.uint32)
    for r in range(rows):
        for c in range(4):  # only first 4 lanes matter for readout
            lo[r, c] = bf16_bits(1000.0 + r * 10 + c)  # value encodes (r, c)
            hi[r, c] = bf16_bits(2000.0 + r * 10 + c)
    words = (hi << 16) | lo
    x = jnp.asarray(words.view(np.int32))

    for out_shape in [(rows * 2, cols), (rows, cols * 2)]:
        try:
            out = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
            )(x)
            o = np.asarray(out, np.float32)
            print(f"pltpu.bitcast -> shape {out_shape} OK")
            print("  out[0:4, 0:4]:")
            for r in range(4):
                print("   ", [round(float(v)) for v in o[r, :4]])
            if out_shape[0] == rows * 2:
                print("  rows 8:12 (second half if split-by-half):")
                for r in range(8, 12):
                    print("   ", [round(float(v)) for v in o[r, :4]])
            return
        except Exception as e:  # noqa: BLE001
            print(f"pltpu.bitcast -> shape {out_shape} failed: {type(e).__name__}: {str(e)[:200]}")


def probe_lax_bitcast():
    """jax.lax.bitcast_convert_type in-kernel: (8,128) int32 -> (8,128,2) bf16."""

    def kernel(x_ref, o_ref):
        b = jax.lax.bitcast_convert_type(x_ref[...], jnp.bfloat16)  # (8,128,2)
        o_ref[...] = b.reshape(8, 256)

    def bf16_bits(v):
        return int(np.asarray(v, jnp.bfloat16).view(np.uint16))

    lo = np.zeros((8, 128), np.uint32)
    hi = np.zeros((8, 128), np.uint32)
    for r in range(4):
        for c in range(4):
            lo[r, c] = bf16_bits(1000.0 + r * 10 + c)
            hi[r, c] = bf16_bits(2000.0 + r * 10 + c)
    x = jnp.asarray(((hi << 16) | lo).view(np.int32))
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((8, 256), jnp.bfloat16)
        )(x)
        o = np.asarray(out, np.float32)
        print("lax.bitcast_convert_type reshape(8,256) OK; out[0:2, 0:8]:")
        for r in range(2):
            print("   ", [round(float(v)) for v in o[r, :8]])
    except Exception as e:  # noqa: BLE001
        print(f"lax.bitcast in-kernel failed: {type(e).__name__}: {str(e)[:300]}")


def probe_magic_or():
    """End-to-end magic unpack: codes -> (0x4300 | n) halves -> bf16 - 128."""

    def kernel(w_ref, o_ref):
        w = w_ref[...]
        slabs = []
        for j in range(4):
            t = (jax.lax.shift_right_logical(w, 4 * j) & jnp.int32(0x000F000F)) | jnp.int32(
                0x43004300
            )
            slabs.append(pltpu.bitcast(t, jnp.bfloat16))  # (16, 128)?
        o_ref[...] = jnp.concatenate(slabs, axis=0) - jnp.bfloat16(128.0)

    rng = np.random.default_rng(0)
    codes = rng.integers(0, 16, size=(64, 128), dtype=np.uint32)  # logical (64,128)
    # Pack: word (r, c) nibble j*... -> TBD once bitcast layout is known.
    # For the probe: pack bits [4j : 4j+4] of half h with code[h-dependent row].
    # halves: low half rows?? -- we just read out what the kernel produces
    # for a known packing and print the mapping.
    words = np.zeros((8, 128), np.uint32)
    for j in range(4):
        for h in range(2):
            # trial packing: code index (j, h, r) -> row j*16 + h*8 + r
            block = codes[j * 16 + h * 8 : j * 16 + h * 8 + 8]  # (8, 128)
            words |= (block & 0xF) << (4 * j + 16 * h)
    x = jnp.asarray(words.view(np.int32))
    try:
        out = pl.pallas_call(
            kernel, out_shape=jax.ShapeDtypeStruct((64, 128), jnp.bfloat16)
        )(x)
        o = np.asarray(out, np.float32).astype(np.int32)
        # Find the permutation: for each output row, which logical row is it?
        matches = []
        for orow in range(16):
            hits = [
                lrow
                for lrow in range(64)
                if np.array_equal(o[orow], codes[lrow].astype(np.int32))
            ]
            matches.append((orow, hits))
        print("magic-or unpack: output row -> logical packed row (first slab j=0):")
        for orow, hits in matches:
            print(f"  out[{orow}] = packed rows {hits}")
    except Exception as e:  # noqa: BLE001
        print(f"magic-or probe failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    probe_pltpu_bitcast()
    probe_lax_bitcast()
    probe_magic_or()
