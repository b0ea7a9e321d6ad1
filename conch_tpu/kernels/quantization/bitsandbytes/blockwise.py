# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Blockwise NF4/FP4/dynamic-8bit quantization codecs, fully vectorized.

TPU-native re-design of the reference Triton kernels
(``conch/kernels/quantization/bitsandbytes/quantize_blockwise.py:140-250``
and ``dequantize_blockwise.py:114-210``). The reference is forced into a
*scalar per-element loop* by Triton's lack of vectorized table lookups —
documented there as a 50-100x perf cliff (``docs/performance/bitsandbytes.md``).

On TPU we express the codecs as pure vector ops that XLA fuses into a
single HBM sweep:

- NF4/FP4 *encode* is a sum of 15 (resp. 7) vectorized threshold compares
  (the same threshold trees as the reference, flattened);
- NF4/FP4 *decode* is a 16-way select tree on nibbles;
- dynamic 8-bit encode is a vectorized ``searchsorted`` + nearest-midpoint
  round; decode is a single gather into the 256-entry code table.

Nibble packing matches bitsandbytes byte layout exactly: element ``2i`` in
the high nibble, ``2i+1`` in the low nibble (reference
``quantize_blockwise.py:196-204``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# NF4 code values (reference ``dequantize_blockwise.py:37-71``): the 16
# quantiles of a standard normal, normalized to [-1, 1] (QLoRA appendix E).
NF4_CODE = np.array(
    [
        -1.0,
        -0.6961928009986877,
        -0.5250730514526367,
        -0.39491748809814453,
        -0.28444138169288635,
        -0.18477343022823334,
        -0.09105003625154495,
        0.0,
        0.07958029955625534,
        0.16093020141124725,
        0.24611230194568634,
        0.33791524171829224,
        0.44070982933044434,
        0.5626170039176941,
        0.7229568362236023,
        1.0,
    ],
    dtype=np.float32,
)

# Encode thresholds are the midpoints between consecutive NF4 code values
# (reference ``quantize_blockwise.py:37-69`` hardcodes these as an if-tree).
NF4_THRESHOLDS = (NF4_CODE[:-1] + NF4_CODE[1:]) / 2.0

# FP4 code values indexed by the 3-bit magnitude code (sign handled
# separately); reference ``dequantize_blockwise.py:75-107``.
FP4_MAGNITUDE_CODE = np.array(
    [0.0, 0.0052083333, 0.6666666, 1.0, 0.333333, 0.5, 0.166666, 0.25],
    dtype=np.float32,
)

# Magnitude thresholds and the (non-monotonic) code each level maps to
# (reference ``quantize_blockwise.py:73-93``).
FP4_THRESHOLDS = np.array(
    [0.00260417, 0.0859375, 0.208333334, 0.29166667, 0.4166667, 0.5833334, 0.83333334],
    dtype=np.float32,
)
FP4_LEVEL_TO_CODE = np.array([0, 1, 6, 7, 4, 5, 2, 3], dtype=np.int32)


def _nf4_encode(scaled: jax.Array) -> jax.Array:
    """Map scaled values in [-1, 1] to NF4 codes [0, 15] via threshold compares."""
    code = jnp.zeros(scaled.shape, dtype=jnp.int32)
    for t in NF4_THRESHOLDS:
        code += (scaled > t).astype(jnp.int32)
    return code


def _fp4_encode(scaled: jax.Array) -> jax.Array:
    """Map scaled values to FP4 codes: sign bit (8) + 3-bit magnitude code."""
    sign = jnp.where(scaled < 0, 8, 0).astype(jnp.int32)
    mag = jnp.abs(scaled)
    level = jnp.zeros(mag.shape, dtype=jnp.int32)
    for t in FP4_THRESHOLDS:
        level += (mag > t).astype(jnp.int32)
    code = jnp.asarray(FP4_LEVEL_TO_CODE)[level]
    return sign + code


def _nf4_decode(codes: jax.Array) -> jax.Array:
    """Map NF4 codes [0, 15] to float values via the code table."""
    return jnp.asarray(NF4_CODE)[codes]


def _fp4_decode(codes: jax.Array) -> jax.Array:
    """Map FP4 codes to float values: sign from bit 3, magnitude from table."""
    sign = jnp.where(codes >= 8, -1.0, 1.0)
    mag = jnp.asarray(FP4_MAGNITUDE_CODE)[codes & 0x7]
    return sign * mag


def _code8_encode(scaled: jax.Array, code: jax.Array) -> jax.Array:
    """Nearest-code rounding into a sorted 256-entry code table.

    Vectorized equivalent of the reference's per-element binary search +
    midpoint compare (``quantize_blockwise.py:96-137``).
    """
    hi = jnp.clip(jnp.searchsorted(code, scaled, side="left"), 1, 255)
    lo = hi - 1
    midpoint = (code[lo] + code[hi]) * 0.5
    return jnp.where(scaled > midpoint, hi, lo).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("blocksize", "quant_type", "input_size"))
def quantize_blockwise_launcher(
    x: jax.Array,
    code: jax.Array | None,
    blocksize: int,
    input_size: int,
    quant_type: str,
) -> tuple[jax.Array, jax.Array]:
    """Blockwise quantize ``x`` (flattened) to NF4/FP4 (packed uint8) or 8-bit.

    Returns:
        (packed codes as uint8, per-block absmax as float32).
    """
    if quant_type in ("nf4", "fp4") and input_size % 2 != 0:
        msg = f"4-bit quantization requires an even input size, got {input_size}"
        raise ValueError(msg)
    flat = x.reshape(-1).astype(jnp.float32)
    num_blocks = -(-input_size // blocksize)
    padded = num_blocks * blocksize
    if padded != input_size:
        flat = jnp.pad(flat, (0, padded - input_size))
    blocks = flat.reshape(num_blocks, blocksize)

    absmax = jnp.max(jnp.abs(blocks), axis=1)
    # An all-zero block has absmax 0; guard the reciprocal so its codes
    # quantize 0/0 -> 0 instead of NaN (dequant multiplies by absmax=0,
    # so any finite code round-trips to exact zeros).
    scaled = blocks * jnp.where(absmax > 0.0, 1.0 / absmax, 0.0)[:, None]

    if quant_type == "nf4":
        codes = _nf4_encode(scaled)
    elif quant_type == "fp4":
        codes = _fp4_encode(scaled)
    else:
        out = _code8_encode(scaled.reshape(-1), code.astype(jnp.float32))[:input_size]
        return out, absmax

    # Pack two 4-bit codes per byte: even element -> high nibble.
    pairs = codes.reshape(-1, 2)
    packed = (pairs[:, 0] * 16 + pairs[:, 1]).astype(jnp.uint8)
    packed = packed[: input_size // 2]
    return packed.reshape(-1, 1), absmax


@functools.partial(jax.jit, static_argnames=("blocksize", "quant_type", "output_size", "output_dtype"))
def dequantize_blockwise_launcher(
    x: jax.Array,
    absmax: jax.Array,
    code: jax.Array | None,
    blocksize: int,
    output_size: int,
    quant_type: str,
    output_dtype=jnp.float32,
) -> jax.Array:
    """Blockwise dequantize packed NF4/FP4 or 8-bit codes to ``output_dtype``."""
    flat = x.reshape(-1)

    if quant_type in ("nf4", "fp4"):
        packed = flat.astype(jnp.int32)
        high = packed >> 4
        low = packed & 0x0F
        codes = jnp.stack([high, low], axis=-1).reshape(-1)  # element 2i from high nibble
        values = _nf4_decode(codes) if quant_type == "nf4" else _fp4_decode(codes)
    else:
        values = code.astype(jnp.float32)[flat.astype(jnp.int32)]

    num_blocks = -(-output_size // blocksize)
    padded = num_blocks * blocksize
    if values.shape[0] != padded:
        values = jnp.pad(values, (0, padded - values.shape[0]))
    values = values.reshape(num_blocks, blocksize) * absmax.astype(jnp.float32)[:, None]
    return values.reshape(-1)[:output_size].astype(output_dtype)
