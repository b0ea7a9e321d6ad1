# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Groupwise weight quantization and int32 row packing utilities.

From-scratch equivalent of the vendored vLLM helpers
(``conch/third_party/vllm/quant_utils.py:14-125``): used by tests and model
loading to produce groupwise-quantized, 32-bit-packed weights in the
standard GPTQ row layout (word ``r`` of a column holds elements
``k = r*pack_factor + i`` in bit-field ``i``).
"""

from __future__ import annotations

import numpy as np

from conch_tpu.types.scalar_type import ScalarType


def get_pack_factor(num_bits: int) -> int:
    assert 32 % num_bits == 0, f"Unsupported num_bits = {num_bits}"
    return 32 // num_bits


def quantize_weights(
    w: np.ndarray,
    quant_type: ScalarType,
    group_size: int | None,
    zero_points: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray | None, np.ndarray | None]:
    """Groupwise-quantize a (K, N) float weight matrix.

    Returns:
        (w_ref, w_q, w_s, w_zp): dequantized reference, integer codes
        (with the type's bias applied), per-group scales, optional
        per-group zero points.
    """
    assert quant_type.is_integer()
    orig_dtype = w.dtype
    size_k, size_n = w.shape
    w = np.asarray(w, dtype=np.float64)

    if group_size is None or group_size == -1:
        group_size = size_k
    assert size_k % group_size == 0
    num_groups = size_k // group_size

    # (num_groups, group_size, N) view for per-group stats.
    wg = w.reshape(num_groups, group_size, size_n)
    max_val = wg.max(axis=1)
    min_val = wg.min(axis=1)

    max_q = float(quant_type.max())
    min_q = float(quant_type.min())

    if zero_points:
        assert not quant_type.is_signed() and max_q > 0
        w_s = np.clip(max_val - min_val, 1e-5, None) / max_q
        w_zp = np.clip(np.round(np.abs(min_val / w_s)), min_q, max_q).astype(np.int64)
    else:
        w_s = np.maximum(
            np.abs(max_val / (max_q if max_q != 0 else np.inf)),
            np.abs(min_val / (min_q if min_q != 0 else np.inf)),
        )
        w_zp = None

    s_full = np.repeat(w_s, group_size, axis=0)  # (K, N)
    zp_full = np.repeat(w_zp, group_size, axis=0) if w_zp is not None else 0

    w_q = np.round(w / s_full).astype(np.int64) + zp_full
    w_q = np.clip(w_q, min_q, max_q)

    w_ref = ((w_q - zp_full) * s_full).astype(orig_dtype)

    if quant_type.has_bias():
        w_q = w_q + quant_type.bias

    return (
        w_ref,
        w_q.astype(np.int64),
        w_s.astype(orig_dtype),
        w_zp.astype(np.int32) if w_zp is not None else None,
    )


def pack_rows(q_w: np.ndarray, num_bits: int) -> np.ndarray:
    """Pack a (K, N) integer matrix into (K // pack_factor, N) int32 words.

    Word ``r`` holds element ``r*pack + i`` in bits ``[i*num_bits, (i+1)*num_bits)``.
    """
    size_k, size_n = q_w.shape
    pack_factor = get_pack_factor(num_bits)
    assert size_k % pack_factor == 0

    q = np.asarray(q_w, dtype=np.uint32)
    packed = np.zeros((size_k // pack_factor, size_n), dtype=np.uint32)
    for i in range(pack_factor):
        packed |= q[i::pack_factor, :] << (num_bits * i)
    return packed.astype(np.int32)


def unpack_rows(packed: np.ndarray, num_bits: int, size_k: int) -> np.ndarray:
    """Inverse of :func:`pack_rows`; returns (K, N) unsigned codes."""
    pack_factor = get_pack_factor(num_bits)
    mask = (1 << num_bits) - 1
    p = np.asarray(packed, dtype=np.uint32)
    out = np.zeros((size_k, p.shape[1]), dtype=np.uint32)
    for i in range(pack_factor):
        out[i::pack_factor, :] = (p >> (num_bits * i)) & mask
    return out


def pack_rows_planar(q_w: np.ndarray, num_bits: int, group_size: int) -> np.ndarray:
    """Pack (K, N) codes planar-within-group: fast unpack on the TPU VPU.

    Within each quantization group of ``group_size`` rows, word ``r``'s
    bit-field ``i`` holds logical row ``i*rpg + r`` (``rpg = group_size /
    pack_factor``). Unpacking a group is then a *sublane concatenation* of
    the shifted bit-field slabs — no cross-sublane interleave — which
    Mosaic lowers to tile-aligned register copies instead of the shuffle
    cascade the GPTQ row-interleaved layout (:func:`pack_rows`) needs.
    """
    pack_factor = get_pack_factor(num_bits)
    size_k, size_n = q_w.shape
    assert size_k % group_size == 0, (size_k, group_size)
    assert group_size % pack_factor == 0, (group_size, pack_factor)
    rpg = group_size // pack_factor
    q = np.asarray(q_w, dtype=np.uint32).reshape(size_k // group_size, pack_factor, rpg, size_n)
    packed = np.zeros((size_k // group_size, rpg, size_n), dtype=np.uint32)
    for i in range(pack_factor):
        packed |= q[:, i] << (num_bits * i)
    return packed.reshape(size_k // pack_factor, size_n).astype(np.int32)


def unpack_rows_planar(packed: np.ndarray, num_bits: int, size_k: int, group_size: int) -> np.ndarray:
    """Inverse of :func:`pack_rows_planar`; returns (K, N) unsigned codes."""
    pack_factor = get_pack_factor(num_bits)
    mask = (1 << num_bits) - 1
    rpg = group_size // pack_factor
    p = np.asarray(packed, dtype=np.uint32).reshape(size_k // group_size, rpg, -1)
    out = np.zeros((size_k // group_size, pack_factor, rpg, p.shape[-1]), dtype=np.uint32)
    for i in range(pack_factor):
        out[:, i] = (p >> (num_bits * i)) & mask
    return out.reshape(size_k, p.shape[-1])
