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

    # All-zero columns (pack-time N padding) have scale 0: quantize them
    # with scale 1 so 0/0 never produces nan codes (dequant is exact
    # either way — scale 0 times any code is 0).
    s_safe = np.where(s_full == 0.0, 1.0, s_full)
    w_q = np.round(w / s_safe).astype(np.int64) + zp_full
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


def pack_rows_magic(q_w: np.ndarray, num_bits: int, group_size: int) -> np.ndarray:
    """Pack (K, N) 4-bit codes for the magic bf16-bitcast unpack kernel.

    The fastest measured decode layout on v5e (tools/drive/logs/
    exp_int4_gemm_r4.log: 733-792 Gel/s vs 601 planar at equal tiles).
    The kernel extracts field ``j`` as ``(w >> 4j) & 0x000F000F |
    0x43004300`` and bitcasts the int32 block straight to bf16 — each
    half-word becomes the exactly-representable value ``128 + code``
    with **zero convert ops** (the 128 and the quantization bias fold
    into the post-dot zero-point correction). Mosaic's int32->bf16
    bitcast interleaves halves by sublane (out row 2r = low half of word
    row r, 2r+1 = high half; tools/drive/exp_bitcast_probe.py), so
    within each group, logical row ``l`` lives in word row
    ``(l % (group_size/4)) // 2``, field ``l // (group_size/4)``, half
    ``l % 2``.

    Only ``num_bits=4`` with ``group_size % 8 == 0`` is supported.
    """
    assert num_bits == 4, "magic layout is 4-bit only"
    size_k, size_n = q_w.shape
    assert size_k % group_size == 0, (size_k, group_size)
    assert group_size % 8 == 0, group_size
    spg = group_size // 4  # logical rows per field slab
    num_groups = size_k // group_size
    # (G, field j, word row r, half h, N)
    c = np.asarray(q_w, dtype=np.uint32).reshape(num_groups, 4, spg // 2, 2, size_n)
    packed = np.zeros((num_groups, spg // 2, size_n), dtype=np.uint32)
    for j in range(4):
        for h in range(2):
            packed |= (c[:, j, :, h] & 0xF) << (4 * j + 16 * h)
    return packed.reshape(size_k // 8, size_n).astype(np.int32)


def unpack_rows_magic(packed: np.ndarray, size_k: int, group_size: int) -> np.ndarray:
    """Inverse of :func:`pack_rows_magic`; returns (K, N) unsigned codes."""
    spg = group_size // 4
    p = np.asarray(packed, dtype=np.uint32).reshape(size_k // group_size, spg // 2, -1)
    out = np.zeros((size_k // group_size, 4, spg // 2, 2, p.shape[-1]), dtype=np.uint32)
    for j in range(4):
        for h in range(2):
            out[:, j, :, h] = (p >> (4 * j + 16 * h)) & 0xF
    return out.reshape(size_k, p.shape[-1])


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
