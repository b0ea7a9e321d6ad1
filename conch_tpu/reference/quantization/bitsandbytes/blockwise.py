# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Golden numpy reference for bitsandbytes blockwise quantization.

Independent (numpy) implementation of the NF4/FP4/dynamic-8bit codecs,
mirroring the reference's PyTorch references
(``conch/reference/quantization/bitsandbytes/*``): used by tests to
cross-check the vectorized jnp kernels. Scalar semantics follow the
reference Triton threshold trees exactly
(``kernels/quantization/bitsandbytes/quantize_blockwise.py:37-137``).
"""

from __future__ import annotations

import numpy as np

from conch_tpu.kernels.quantization.bitsandbytes.blockwise import (
    FP4_LEVEL_TO_CODE,
    FP4_MAGNITUDE_CODE,
    FP4_THRESHOLDS,
    NF4_CODE,
    NF4_THRESHOLDS,
)


def nf4_quantize_scalar(x: float) -> int:
    """Scalar NF4 encode (threshold tree semantics)."""
    return int(np.sum(x > NF4_THRESHOLDS))


def fp4_quantize_scalar(x: float) -> int:
    """Scalar FP4 encode: sign bit + magnitude level."""
    sign = 8 if x < 0 else 0
    level = int(np.sum(abs(x) > FP4_THRESHOLDS))
    return sign + int(FP4_LEVEL_TO_CODE[level])


def nf4_dequantize_scalar(code: int) -> float:
    return float(NF4_CODE[code])


def fp4_dequantize_scalar(code: int) -> float:
    sign = -1.0 if code >= 8 else 1.0
    return sign * float(FP4_MAGNITUDE_CODE[code & 0x7])


def quantize_blockwise(
    x: np.ndarray, blocksize: int, quant_type: str, code: np.ndarray | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Blockwise quantize; returns (packed uint8, per-block absmax fp32)."""
    flat = np.asarray(x, dtype=np.float32).reshape(-1)
    n = flat.size
    num_blocks = -(-n // blocksize)
    padded = np.pad(flat, (0, num_blocks * blocksize - n)).reshape(num_blocks, blocksize)
    absmax = np.max(np.abs(padded), axis=1)
    scaled = padded / absmax[:, None]

    if quant_type == "nf4":
        codes = (scaled[..., None] > NF4_THRESHOLDS).sum(-1)
    elif quant_type == "fp4":
        sign = np.where(scaled < 0, 8, 0)
        level = (np.abs(scaled)[..., None] > FP4_THRESHOLDS).sum(-1)
        codes = sign + FP4_LEVEL_TO_CODE[level]
    else:
        assert code is not None
        sorted_code = np.asarray(code, dtype=np.float32)
        vals = scaled.reshape(-1)
        hi = np.clip(np.searchsorted(sorted_code, vals, side="left"), 1, 255)
        lo = hi - 1
        mid = (sorted_code[lo] + sorted_code[hi]) * 0.5
        out = np.where(vals > mid, hi, lo).astype(np.uint8)[:n]
        return out, absmax

    pairs = codes.reshape(-1, 2)
    packed = (pairs[:, 0] * 16 + pairs[:, 1]).astype(np.uint8)[: n // 2]
    return packed.reshape(-1, 1), absmax


def dequantize_blockwise(
    packed: np.ndarray,
    absmax: np.ndarray,
    blocksize: int,
    output_size: int,
    quant_type: str,
    code: np.ndarray | None = None,
) -> np.ndarray:
    """Blockwise dequantize back to fp32."""
    flat = np.asarray(packed, dtype=np.uint8).reshape(-1)
    if quant_type in ("nf4", "fp4"):
        high, low = flat >> 4, flat & 0x0F
        codes = np.stack([high, low], axis=-1).reshape(-1)
        if quant_type == "nf4":
            values = NF4_CODE[codes]
        else:
            values = np.where(codes >= 8, -1.0, 1.0) * FP4_MAGNITUDE_CODE[codes & 0x7]
    else:
        assert code is not None
        values = np.asarray(code, dtype=np.float32)[flat]

    num_blocks = -(-output_size // blocksize)
    values = np.pad(values, (0, num_blocks * blocksize - values.size))
    values = values.reshape(num_blocks, blocksize) * np.asarray(absmax, dtype=np.float32)[:, None]
    return values.reshape(-1)[:output_size]
