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
- NF4/FP4 *decode* is a binary select tree on the nibble's bits (a
  16-entry table gather lowers pathologically on TPU — measured ~70x
  slower than the select tree at 16M elements);
- dynamic 8-bit encode is a vectorized ``searchsorted`` + nearest-midpoint
  round; decode is a single gather into the 256-entry code table.

Two TPU layout rules shape the implementation (measured on v5e, each
worth an order of magnitude at 16M elements):

1. every tensor stays in wide-minor 2D tiles of ``_ROW`` elements —
   1D shapes and minor-dim-2 shapes force vector relayouts;
2. the even/odd nibble interleave is a *dtype pun*, not a shuffle: the
   two decoded code planes are packed into one uint16 lane (low byte =
   element 2i) and bitcast to a uint8 pair stream, which is free.

Nibble packing matches bitsandbytes byte layout exactly: element ``2i`` in
the high nibble, ``2i+1`` in the low nibble (reference
``quantize_blockwise.py:196-204``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import round_up, use_interpret_mode

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


# Row width for the 2D working layout: wide enough that the minor dim
# fills vector lanes; every intermediate keeps this shape (see module
# docstring rule 1).
_ROW = 512


def _apply_lut(idx: jax.Array, lut) -> jax.Array:
    """``lut[idx]`` as a binary select tree on the bits of ``idx``.

    A small-table gather lowers to a pathological pattern on TPU; for a
    power-of-two constant table, log2(n) levels of vectorized selects
    fuse into the surrounding elementwise code instead.
    """
    values = [float(v) for v in np.asarray(lut, np.float64)]
    levels = (len(values) - 1).bit_length()
    bits = [(idx & (1 << k)) != 0 for k in range(levels)]

    def sel(lo: int, hi: int, level: int) -> jax.Array:
        if level < 0:
            return jnp.float32(values[lo])
        mid = (lo + hi + 1) // 2
        return jnp.where(bits[level], sel(mid, hi, level - 1), sel(lo, mid - 1, level - 1))

    return sel(0, len(values) - 1, levels - 1)


def _rank_bisect(x: jax.Array, thresholds) -> jax.Array:
    """``sum(x > t for t in thresholds)`` by branchless binary search.

    ``thresholds`` must be sorted ascending with ``len == 2**L - 1``. Each
    of the L rounds compares against ONE threshold chosen by a select
    tree over the bits found so far: 4 compares + 11 selects for 15
    thresholds, vs 15 compare+accumulates for the flat sum — the encode
    tree was the quantize kernel's top ablation cost (exp_bnb_r4.log
    ``q_noencode``). Bit-identical to the flat sum: the compares use the
    same f32 constants, only their order changes.
    """
    n = len(thresholds) + 1
    levels = n.bit_length() - 1
    if n != 1 << levels:
        msg = f"_rank_bisect needs 2**L - 1 thresholds, got {len(thresholds)}"
        raise ValueError(msg)
    bits: list[jax.Array] = []
    for level in range(levels):
        span = n >> (level + 1)
        cands = [(2 * j + 1) * span - 1 for j in range(1 << level)]

        def sel(lo: int, hi: int, depth: int) -> jax.Array:
            if lo == hi:
                return jnp.float32(thresholds[cands[lo]])
            mid = (lo + hi + 1) // 2
            return jnp.where(bits[depth], sel(mid, hi, depth + 1), sel(lo, mid - 1, depth + 1))

        bits.append(x > sel(0, (1 << level) - 1, 0))
    code = bits[0].astype(jnp.int32) << (levels - 1)
    for i, b in enumerate(bits[1:], start=1):
        code |= b.astype(jnp.int32) << (levels - 1 - i)
    return code


def _nf4_encode(scaled: jax.Array) -> jax.Array:
    """Map scaled values in [-1, 1] to NF4 codes [0, 15]."""
    return _rank_bisect(scaled, NF4_THRESHOLDS)


def _fp4_encode(scaled: jax.Array) -> jax.Array:
    """Map scaled values to FP4 codes: sign bit (8) + 3-bit magnitude code."""
    sign = jnp.where(scaled < 0, 8, 0).astype(jnp.int32)
    mag = jnp.abs(scaled)
    level = _rank_bisect(mag, FP4_THRESHOLDS)
    code = _apply_lut(level, FP4_LEVEL_TO_CODE).astype(jnp.int32)
    return sign + code


def _nf4_decode(codes: jax.Array) -> jax.Array:
    """Map NF4 codes [0, 15] to float values via a bit select tree."""
    return _apply_lut(codes, NF4_CODE)


def _fp4_decode(codes: jax.Array) -> jax.Array:
    """Map FP4 codes to float values: sign from bit 3, magnitude tree."""
    sign = jnp.where(codes >= 8, -1.0, 1.0)
    return sign * _apply_lut(codes & 0x7, FP4_MAGNITUDE_CODE)


def _interleave_pairs_u8(even: jax.Array, odd: jax.Array) -> jax.Array:
    """Stitch two (R, C) uint8 planes into (R, 2C) with even first.

    The dtype pun from the module docstring (rule 2): pack each pair into
    a uint16 lane — little-endian puts the low byte first — and bitcast
    to a uint8 pair stream. Pure elementwise ops, no vector shuffles.
    """
    u16 = even.astype(jnp.uint16) | (odd.astype(jnp.uint16) << 8)
    r, c = even.shape
    return jax.lax.bitcast_convert_type(u16, jnp.uint8).reshape(r, 2 * c)


@functools.cache
def _pack_matrix() -> np.ndarray:
    """(ROW, ROW/2) constant: column i sums 16*code[2i] + code[2i+1].

    Nibble pair packing as ONE bf16 matmul on the MXU: codes are <= 15 and
    packed bytes <= 255, both exactly representable in bf16, so the
    contraction is exact. (The inverse regrouping — splitting lanes into
    pair tuples for a bitcast — lowers to a pathological relayout;
    measured 12x slower than this matmul at 16M elements on v5e.)
    Kept as numpy: a cached jnp array would leak tracers across jit scopes.
    """
    m = np.zeros((_ROW, _ROW // 2), np.float32)
    m[2 * np.arange(_ROW // 2), np.arange(_ROW // 2)] = 16.0
    m[2 * np.arange(_ROW // 2) + 1, np.arange(_ROW // 2)] = 1.0
    return m


def _pack_pairs_u8(codes: jax.Array) -> jax.Array:
    """Pack 4-bit code pairs (even -> high nibble): (R, C) int -> (R*C/2,) u8."""
    r, c = codes.shape
    if (r * c) % _ROW == 0:
        wide = codes.reshape(-1, _ROW).astype(jnp.bfloat16)
        packed = jnp.dot(
            wide, jnp.asarray(_pack_matrix(), jnp.bfloat16), preferred_element_type=jnp.float32
        )
    else:  # non-multiple fallback (tiny inputs): strided lanes
        packed = codes[:, 0::2] * 16 + codes[:, 1::2]
    return packed.astype(jnp.uint8).reshape(-1)


def _work_shape(num_blocks: int, blocksize: int) -> tuple[int, int, int]:
    """(rows, row_width, blocks_per_row) for the 2D working layout.

    Rows are whole blocks; the width targets ~_ROW lanes. For odd
    blocksizes the row is kept even so 4-bit pair packing stays aligned.
    """
    k = max(1, -(-_ROW // blocksize))
    if blocksize % 2 and k % 2:
        k += 1  # keep row width even for nibble pairs
    width = k * blocksize
    rows = -(-num_blocks // k)
    return rows, width, k


def _pack_matrix_iota(bs: int) -> jax.Array:
    """(bs, max(bs//2, 128)) nibble-pair pack matrix (16 at even rows, 1 at
    odd), built from iota in-kernel (pallas kernels cannot capture
    constants). Lane dim padded to >=128: Mosaic mis-relayouts the i1
    compare masks at narrower widths; columns past bs//2 are zero (their
    2j >= bs never matches) and the caller slices them off after the dot."""
    jp = max(bs // 2, 128)
    r = jax.lax.broadcasted_iota(jnp.int32, (bs, jp), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (bs, jp), 1)
    # Select in i32 (same (8,128) tiling as the compare mask) and convert;
    # an i1 mask feeding a bf16 select trips a Mosaic relayout bug.
    m = jnp.where(r == 2 * j, 16, 0) + jnp.where(r == 2 * j + 1, 1, 0)
    return m.astype(jnp.bfloat16)


def _unpack_matrices_iota(bs: int) -> tuple[jax.Array, jax.Array]:
    """(bs//2, max(bs, 128)) scatter matrices: E places the high nibble at
    lane 2j, O the low nibble at lane 2j+1; built from iota in-kernel.
    Lane dim padded to >=128 (same Mosaic i1-relayout workaround as
    :func:`_pack_matrix_iota`); extra columns never match and the caller
    slices the dot output."""
    cp_ = max(bs, 128)
    j = jax.lax.broadcasted_iota(jnp.int32, (bs // 2, cp_), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (bs // 2, cp_), 1)
    # i32 selects + convert (see _pack_matrix_iota: i1->bf16 select trips
    # a Mosaic relayout bug).
    e = jnp.where(c == 2 * j, 1, 0).astype(jnp.bfloat16)
    o = jnp.where(c == 2 * j + 1, 1, 0).astype(jnp.bfloat16)
    return e, o


def _roll_absmax_wide(x: jax.Array, bs: int) -> jax.Array:
    """Per-contiguous-``bs``-lane-group absmax, broadcast to full width.

    Pure lane rotates — Mosaic rejects the 3D ``(bt, k, bs)`` reshape a
    minor-dim reduce would need ("infer-vector-layout: unsupported shape
    cast"), so the reduce is log2(bs) roll+max steps (leaving each group's
    max at its first lane) followed by log2(bs) roll+select steps that
    re-broadcast the group-start lane across the group (the first loop's
    wraparound pollutes non-start lanes with the next group's values).
    Requires power-of-two ``bs`` (enforced by ``_PALLAS_MAX_BS`` gating).
    """
    w = x.shape[-1]
    a = jnp.abs(x)
    s = 1
    while s < bs:
        a = jnp.maximum(a, pltpu.roll(a, w - s, 1))  # lane l sees a[l+s]
        s *= 2
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % bs
    s = 1
    while s < bs:
        a = jnp.where(lane >= s, pltpu.roll(a, s, 1), a)
        s *= 2
    return a


def _extract_matrix_iota(w: int, bs: int) -> jax.Array:
    """(w, max(w//bs, 128)) one-hot: column j selects lane ``j*bs``.

    Narrows the roll-broadcast absmax (bt, w) to the per-block (bt, k)
    output via one MXU dot (lane dim padded to >=128; see
    :func:`_pack_matrix_iota` for the i1-select workaround)."""
    kp = max(w // bs, 128)
    r = jax.lax.broadcasted_iota(jnp.int32, (w, kp), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (w, kp), 1)
    return jnp.where(r == j * bs, 1, 0).astype(jnp.bfloat16)


def _expand_matrix_iota(k: int, w: int) -> jax.Array:
    """(k, w) one-hot: row j covers lanes ``[j*bs, (j+1)*bs)`` (bs = w//k).

    Expands per-block absmax (bt, k) to full row width via one MXU dot —
    the reshape-free inverse of :func:`_extract_matrix_iota`."""
    bs = w // k
    j = jax.lax.broadcasted_iota(jnp.int32, (k, w), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, w), 1)
    return jnp.where(c // bs == j, 1, 0).astype(jnp.bfloat16)


def _split_bf16_terms(x: jax.Array, exact: bool) -> list[jax.Array]:
    """f32 -> bf16 term list whose sum reconstructs ``x`` (3 terms exact)."""
    a0 = x.astype(jnp.bfloat16)
    if not exact:
        return [a0]
    r1 = x - a0.astype(jnp.float32)
    a1 = r1.astype(jnp.bfloat16)
    a2 = (r1 - a1.astype(jnp.float32)).astype(jnp.bfloat16)
    return [a0, a1, a2]


def _quantize4_kernel(x_ref, packed_ref, am_ref, *, quant_type: str, bs: int, k: int):
    """k quantization blocks per 512-lane row, every phase at FULL lane
    width (a one-block-per-row (BT, 64) layout ran every VPU op at half
    lanes and measured 58 GB/s). Mosaic rejects the 3D (bt, k, bs) reshape
    a minor-dim reduce would need, and log2(bs) lane-roll reductions
    measured 2x the whole kernel's budget (exp_bnb_r4.log q_norolls), so:

    - per-block absmax = k native lane reductions over 64-lane slices,
      concatenated to the narrow (BT, k) output directly (no extract dot);
    - the reciprocal is computed on the tiny (BT, k) tile and expanded to
      (BT, W) by a one-hot MXU dot (exact 3-term bf16 split: three
      non-overlapping 8-bit mantissa slices reconstruct the f32 exactly);
    - the cross-lane pair packing rides the MXU (codes <= 15 and packed
      bytes <= 255 are bf16-exact)."""
    bt, w = x_ref.shape
    x = x_ref[...].astype(jnp.float32)  # (BT, W)
    a = jnp.abs(x)
    if k == 1:
        am = jnp.max(a, axis=1, keepdims=True)  # (BT, 1)
        recip = jnp.where(am > 0.0, 1.0 / am, 0.0)
        recip_wide = jnp.broadcast_to(recip, (bt, w))
    else:
        am = jnp.concatenate(
            [jnp.max(a[:, g * bs : (g + 1) * bs], axis=1, keepdims=True) for g in range(k)],
            axis=1,
        )  # (BT, k)
        recip = jnp.where(am > 0.0, 1.0 / am, 0.0)
        exp = _expand_matrix_iota(k, w)
        recip_wide = sum(
            jnp.dot(t, exp, preferred_element_type=jnp.float32)
            for t in _split_bf16_terms(recip, True)
        )
    scaled = x * recip_wide
    codes = _nf4_encode(scaled) if quant_type == "nf4" else _fp4_encode(scaled)
    packmat = _pack_matrix_iota(w)
    packed = jnp.dot(codes.astype(jnp.bfloat16), packmat, preferred_element_type=jnp.float32)
    packed = packed[:, : w // 2]
    # Mosaic has no f32->u8 convert: round-trip through i32 (values are
    # exact integers <= 255, so the truncating casts are lossless).
    packed_ref[...] = packed.astype(jnp.int32).astype(jnp.uint8)
    am_ref[...] = am


def _dequantize4_kernel(p_ref, am_ref, out_ref, *, quant_type: str, bs: int, k: int):
    """Inverse sweep: u8 packed -> nibble split -> MXU interleave -> decode
    at full lane width -> per-block scale via a one-hot MXU expand (the 3D
    broadcast+reshape Mosaic rejects; exact 3-term bf16 split)."""
    bt = p_ref.shape[0]
    w = out_ref.shape[1]
    p = p_ref[...].astype(jnp.int32)  # (BT, W/2)
    hi = (p >> 4).astype(jnp.bfloat16)  # element 2j
    lo = (p & 0x0F).astype(jnp.bfloat16)
    e, o = _unpack_matrices_iota(w)
    codes_f = jnp.dot(hi, e, preferred_element_type=jnp.float32)
    codes_f += jnp.dot(lo, o, preferred_element_type=jnp.float32)
    codes = codes_f[:, :w].astype(jnp.int32)  # exact: values <= 15
    values = _nf4_decode(codes) if quant_type == "nf4" else _fp4_decode(codes)
    am = am_ref[...].astype(jnp.float32)  # (BT, k)
    if k == 1:
        am_wide = jnp.broadcast_to(am, (bt, w))
    else:
        exp = _expand_matrix_iota(k, w)
        am_wide = sum(
            jnp.dot(t, exp, preferred_element_type=jnp.float32)
            for t in _split_bf16_terms(am, True)
        )
    out_ref[...] = (values * am_wide).astype(out_ref.dtype)


def _work_geometry(blocksize: int) -> tuple[int, int, int]:
    """(rows_per_step, row_width, blocks_per_row) for the Pallas codecs."""
    w = max(blocksize, 512)
    k = w // blocksize
    bt = max(32, min(2048, (1 << 20) // (w * 4) // 32 * 32))
    return bt, w, k


def _quantize4_pallas(flat: jax.Array, num_blocks: int, blocksize: int, quant_type: str):
    bt, w, k = _work_geometry(blocksize)
    if flat.dtype not in (jnp.float32, jnp.bfloat16):
        flat = flat.astype(jnp.float32)
    rows = -(-num_blocks // k)
    rows_pad = round_up(rows, bt)
    if flat.shape[0] != rows_pad * w:
        flat = jnp.pad(flat, (0, rows_pad * w - flat.shape[0]))
    x2 = flat.reshape(rows_pad, w)
    packed, am = pl.pallas_call(
        functools.partial(_quantize4_kernel, quant_type=quant_type, bs=blocksize, k=k),
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
    return packed.reshape(-1), am.reshape(-1)[:num_blocks]


def _dequantize4_pallas(
    packed: jax.Array, absmax: jax.Array, num_blocks: int, blocksize: int,
    quant_type: str, output_dtype,
):
    bt, w, k = _work_geometry(blocksize)
    rows = -(-num_blocks // k)
    rows_pad = round_up(rows, bt)
    if packed.shape[0] != rows_pad * (w // 2):
        packed = jnp.pad(packed, (0, rows_pad * (w // 2) - packed.shape[0]))
    if absmax.shape[0] != rows_pad * k:
        absmax = jnp.pad(absmax, (0, rows_pad * k - absmax.shape[0]))
    out = pl.pallas_call(
        functools.partial(_dequantize4_kernel, quant_type=quant_type, bs=blocksize, k=k),
        out_shape=jax.ShapeDtypeStruct((rows_pad, w), output_dtype),
        grid=(rows_pad // bt,),
        in_specs=[
            pl.BlockSpec((bt, w // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, w), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=use_interpret_mode(),
    )(packed.reshape(rows_pad, w // 2), absmax.astype(jnp.float32).reshape(rows_pad, k))
    return out.reshape(-1)


# Pallas 4-bit path applies below this blocksize bound: one block per row
# keeps the MXU pack/interleave at <= 256 MACs/element. Larger blocksizes
# (1024..4096, rare) keep the XLA formulation.
_PALLAS_MAX_BS = 512


def _use_pallas4(blocksize: int) -> bool:
    """Pallas codec eligibility: the roll-based absmax needs a power-of-two
    blocksize (real bnb blocksizes are 64..4096); others keep the XLA path."""
    return blocksize & (blocksize - 1) == 0 and 2 <= blocksize <= _PALLAS_MAX_BS


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
    num_blocks = -(-input_size // blocksize)

    if quant_type in ("nf4", "fp4") and _use_pallas4(blocksize):
        # No pre-cast: the kernel upcasts each block in VMEM; materializing
        # an f32 copy here costs two extra passes over the input.
        packed, absmax = _quantize4_pallas(x.reshape(-1), num_blocks, blocksize, quant_type)
        return packed[: input_size // 2].reshape(-1, 1), absmax

    rows, width, k = _work_shape(num_blocks, blocksize)

    flat = x.reshape(-1).astype(jnp.float32)
    if rows * width != input_size:
        flat = jnp.pad(flat, (0, rows * width - input_size))
    blocks = flat.reshape(rows, k, blocksize)

    am2 = jnp.max(jnp.abs(blocks), axis=2)  # (rows, k)
    absmax = am2.reshape(-1)[:num_blocks]
    # An all-zero block has absmax 0; guard the reciprocal so its codes
    # quantize 0/0 -> 0 instead of NaN (dequant multiplies by absmax=0,
    # so any finite code round-trips to exact zeros).
    scaled = (blocks * jnp.where(am2 > 0.0, 1.0 / am2, 0.0)[:, :, None]).reshape(rows, width)

    if quant_type == "nf4":
        codes = _nf4_encode(scaled)
    elif quant_type == "fp4":
        codes = _fp4_encode(scaled)
    else:
        out = _code8_encode(scaled, code.astype(jnp.float32)).reshape(-1)[:input_size]
        return out, absmax

    # Pack two 4-bit codes per byte: even element -> high nibble.
    packed = _pack_pairs_u8(codes)[: input_size // 2]
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
    num_blocks = -(-output_size // blocksize)

    if quant_type in ("nf4", "fp4") and _use_pallas4(blocksize):
        out = _dequantize4_pallas(
            x.reshape(-1), absmax, num_blocks, blocksize, quant_type, output_dtype
        )
        return out[:output_size]

    rows, width, k = _work_shape(num_blocks, blocksize)

    flat = x.reshape(-1)
    if quant_type in ("nf4", "fp4"):
        if flat.shape[0] != rows * width // 2:
            flat = jnp.pad(flat, (0, rows * width // 2 - flat.shape[0]))
        packed = flat.reshape(rows, width // 2).astype(jnp.int32)
        codes = _interleave_pairs_u8(
            (packed >> 4).astype(jnp.uint8), (packed & 0x0F).astype(jnp.uint8)
        ).astype(jnp.int32)  # (rows, width), element 2i from the high nibble
        values = _nf4_decode(codes) if quant_type == "nf4" else _fp4_decode(codes)
    else:
        if flat.shape[0] != rows * width:
            flat = jnp.pad(flat, (0, rows * width - flat.shape[0]))
        values = code.astype(jnp.float32)[flat.reshape(rows, width).astype(jnp.int32)]

    am2 = absmax.astype(jnp.float32)
    if am2.shape[0] != rows * k:
        am2 = jnp.pad(am2, (0, rows * k - am2.shape[0]))
    values = values.reshape(rows, k, blocksize) * am2.reshape(rows, k)[:, :, None]
    # Cast before the flatten so the relayout moves output-dtype bytes.
    return values.astype(output_dtype).reshape(-1)[:output_size]
