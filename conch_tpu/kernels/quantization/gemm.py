# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU GEMM kernels: mixed-precision (packed sub-byte weights) and scaled.

TPU-native re-design of the reference's unified Triton GEMM
(``conch/kernels/quantization/gemm.py:219-457``, GemLite/GPTQ-triton
lineage). Two frontends, as in the reference:

- **mixed-precision** (``mixed_precision_gemm_launcher``):
  ``C = A @ dequant(B_packed)`` with w{2,4,8}-bit weights packed into int32
  words in standard GPTQ row layout (word ``r`` holds elements
  ``k = r*pack + i`` in bit-field ``i``), per-group scales and optional
  zero-points. The packed block is unpacked *in VMEM registers* right before
  the MXU dot: shift/mask per bit-field, stack, reshape — no scalar loop.
- **scaled** (``scaled_gemm_launcher``): int8/fp8 A and B with per-channel
  (or per-tensor) activation and weight scales applied to the accumulator
  in the epilogue (reference ``gemm.py:407-440``). int8 uses the native
  int8 MXU path with an int32 accumulator; fp8 dequantizes to bf16 in-VMEM
  (no native fp8 MXU before v6e — see ``conch_tpu.platforms``).

Design notes vs the reference:
- No pointer arithmetic or eviction policies: blocks are tiled via
  BlockSpecs; the Mosaic pipeliner double-buffers HBM->VMEM DMAs.
- No swizzled tile order: XLA/Mosaic grid iteration is already sequential
  per-core; K is the innermost ("arbitrary") grid dimension accumulating
  into a VMEM scratch, M/N are parallel (megacore-splittable).
- Dequantized weights are computed in fp32 and cast to the activation dtype
  before the dot, matching the reference's meta-dtype semantics.
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import round_up, use_interpret_mode


class WeightGroupMode(enum.Enum):
    """Dequantization weight group modes (parity: reference ``gemm.py:34-49``)."""

    NONE = 0
    SHIFT = 1
    SYMMETRIC_NO_SHIFT = 2
    SYMMETRIC_WITH_SHIFT = 3
    ASYMMETRIC = 4


class ChannelScaleMode(enum.Enum):
    """Epilogue channel-scaling modes (parity: reference ``gemm.py:68-81``)."""

    NONE = 0
    WEIGHT_ONLY = 1
    ACTIVATION_ONLY = 2
    WEIGHT_AND_ACTIVATION = 3


@dataclass
class MixedPrecisionMatmulMetadata:
    """Metadata for the mixed-precision GEMM (parity: reference ``gemm.py``)."""

    m_dim: int
    k_dim: int
    n_dim: int
    weight_size_bits: int
    weight_bias: int
    group_size: int
    elements_per_sample: int
    zero_is_scalar: bool
    unpack_mask: int
    input_dtype: jnp.dtype
    output_dtype: jnp.dtype
    acc_dtype: jnp.dtype
    meta_dtype: jnp.dtype
    channel_scale_mode: ChannelScaleMode
    weight_group_mode: WeightGroupMode


@dataclass
class ScaledMatmulMetadata:
    """Metadata for the scaled GEMM (parity: reference ``gemm.py``)."""

    m_dim: int
    k_dim: int
    n_dim: int
    input_dtype: jnp.dtype
    output_dtype: jnp.dtype
    acc_dtype: jnp.dtype
    meta_dtype: jnp.dtype
    channel_scale_mode: ChannelScaleMode
    weight_group_mode: WeightGroupMode


def _unpack_block(packed: jax.Array, nbits: int, epp: int, bk: int, bn: int) -> jax.Array:
    """Unpack a (bk//epp, bn) int32 block to (bk, bn) unsigned codes in VMEM.

    Element order matches GPTQ row packing: word ``r`` bit-field ``i`` is
    logical row ``r*epp + i``.
    """
    mask = (1 << nbits) - 1
    fields = [(jax.lax.shift_right_logical(packed, nbits * i) & mask) for i in range(epp)]
    stacked = jnp.stack(fields, axis=1)  # (bk//epp, epp, bn)
    return stacked.reshape(bk, bn)


def _codebook_decode(codes: jax.Array, codebook: tuple[float, ...]) -> jax.Array:
    """Map 4-bit codes to codebook values via a binary select tree.

    15 vectorized selects on the code's bits (VPU-friendly) instead of a
    16-way gather, which Mosaic lowers poorly. This is the in-kernel
    equivalent of the reference's fused dequant loop
    (``conch/kernels/quantization/gemm.py:337-405``) for codebook formats
    (NF4/FP4).
    """
    level = [jnp.float32(v) for v in codebook]
    for bit in range(4):
        mask = (codes >> bit) & 1 == 1
        level = [jnp.where(mask, level[2 * i + 1], level[2 * i]) for i in range(len(level) // 2)]
    return level[0]


def _mixed_gemm_kernel(
    x_ref,
    b_ref,
    s_ref,
    zp_ref,
    o_ref,
    acc_ref,
    *,
    nbits: int,
    epp: int,
    weight_bias: int,
    group_size: int,
    bk: int,
    bn: int,
    has_zp: bool,
    zero_is_scalar: bool,
    num_k: int,
    codebook: tuple[float, ...] | None,
    stacked: bool = False,
):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    b_block = b_ref[0] if stacked else b_ref[...]
    if codebook is not None:
        w = _codebook_decode(_unpack_block(b_block, nbits, epp, bk, bn), codebook)
    else:
        codes = _unpack_block(b_block, nbits, epp, bk, bn).astype(jnp.float32)
        w = codes - float(weight_bias)

    # The BlockSpec index map delivers exactly this K tile's group rows
    # (bk//group_size rows, or one row when a group spans multiple tiles),
    # so group expansion is a broadcast multiply — no one-hot MXU dot, no
    # full meta strip riding along every step.
    gpt = bk // group_size  # groups per tile (0 => tile inside one group)

    def expand_groups(meta_ref):
        m = (meta_ref[0] if stacked else meta_ref[...]).astype(jnp.float32)
        if gpt >= 1:
            return m  # (gpt, 1, bn) broadcasts over (gpt, group_size, bn)
        return m.reshape(1, m.shape[-1])  # broadcasts over (bk, bn)

    if gpt >= 1:
        w = w.reshape(gpt, group_size, bn)

    if has_zp:
        if zero_is_scalar:
            w = w - zp_ref[0]
        else:
            w = w - expand_groups(zp_ref)

    w = w * expand_groups(s_ref)
    if gpt >= 1:
        w = w.reshape(bk, bn)

    x = x_ref[...]
    acc_ref[...] += jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


# Measured-best (bk, bn) for the fused Llama-8B serving shapes, m=8 decode,
# magic layout, v5e (tools/drive/logs/exp_gemm_tiles_r5.log + confirms).
# The generic heuristic covers everything else; these pins also encode the
# two shapes where it guesses wrong (N=6144 prefers 2048 over 3072/6144;
# N=129024 prefers 3584 over 7168 — 1062 vs 801 GB/s).
_MAGIC_TILE_PINS: dict[tuple[int, int], tuple[int, int]] = {
    (4096, 6144): (2048, 2048),    # fused wqkv
    (4096, 4096): (2048, 4096),    # wo
    (4096, 28672): (2048, 4096),   # fused gate|up
    (14336, 4096): (2048, 4096),   # w_down
    (4096, 129024): (2048, 3584),  # lm_head (padded 128256 vocab)
}


@functools.partial(
    jax.jit,
    static_argnames=(
        "weight_size_bits", "weight_bias", "group_size", "zero_is_scalar", "out_dtype", "codebook",
        "layout", "block_n", "block_k",
    ),
)
def mixed_precision_gemm_launcher(
    x: jax.Array,
    w_q_packed: jax.Array,
    w_s: jax.Array,
    w_zp: jax.Array | None,
    *,
    weight_size_bits: int,
    weight_bias: int,
    group_size: int,
    zero_is_scalar: bool = False,
    out_dtype=None,
    codebook: tuple[float, ...] | None = None,
    layout: str = "gptq",
    block_n: int | None = None,
    block_k: int | None = None,
    layer_index: jax.Array | None = None,
) -> jax.Array:
    """``C = x @ dequant(w_q_packed)`` with groupwise scales/zero-points.

    Args:
        x: (M, K) activations (fp32/bf16/fp16).
        w_q_packed: (K // pack_factor, N) int32 packed weights (GPTQ row
            layout), or the whole per-layer stack (L, K // pack_factor, N)
            with ``layer_index`` selecting the layer (see below).
        w_s: (K // group_size, N) per-group scales ((L, ...) when stacked).
        w_zp: optional (K // group_size, N) zero-points, or a single element
            when ``zero_is_scalar``.
        weight_size_bits: bit-width of each packed weight (2/4/8).
        weight_bias: value subtracted from unpacked codes (e.g. 8 for uint4b8).
        group_size: quantization group size along K.
        codebook: optional 16-entry value table; when given, codes index the
            table (NF4/FP4 fused dequant) instead of being linear ints, and
            ``weight_bias`` is ignored.
        layout: ``"gptq"`` (reference row-interleaved packing),
            ``"planar"`` (:func:`conch_tpu.utils.quant_utils.pack_rows_planar`
            within-group planar packing -> per-group-dot kernel), or
            ``"magic"`` (:func:`conch_tpu.utils.quant_utils.pack_rows_magic`
            bf16-bitcast packing -> zero-convert unpack, the fastest
            decode path measured on v5e). ``"planar"`` requires
            ``K % group_size == 0``, ``group_size % pack_factor == 0`` and
            no codebook; ``"magic"`` additionally requires 4-bit weights
            and ``group_size % 8 == 0``.

        layer_index: scalar int32 selecting a layer from stacked (L, ...)
            weight/scale arrays. The index rides Pallas *scalar prefetch*,
            so the kernel DMAs the selected layer's tiles straight out of
            the stacked HBM buffer. This exists because feeding a
            ``lax.scan``/``dynamic_slice`` weight slice to an opaque
            ``pallas_call`` makes XLA materialize the slice — measured on
            v5e (tools/drive/logs/exp_lmhead_r4b.log): the same lm_head
            GEMM runs at 816.7 GB/s fed directly, 201 with a dynamic
            slice, 109 as a scan slice. Stacked mode requires
            pad-free geometry (M may still pad): K % bk == 0, N % bn == 0.

    Returns:
        (M, N) output in ``out_dtype`` (defaults to ``x.dtype``).
    """
    m_dim, k_dim = x.shape
    stacked = w_q_packed.ndim == 3
    if stacked and layer_index is None:
        msg = "stacked (L, K//pack, N) weights require layer_index"
        raise ValueError(msg)
    n_dim = w_q_packed.shape[-1]
    epp = 32 // weight_size_bits
    out_dtype = out_dtype or x.dtype
    if x.dtype == jnp.float16 and not use_interpret_mode():
        x = x.astype(jnp.float32)  # Mosaic has no f16 compute path

    has_zp = w_zp is not None

    if layout == "planar" and (
        codebook is not None or k_dim % group_size != 0 or group_size % epp != 0
    ):
        msg = (
            "planar layout requires a non-codebook format with K % group_size == 0 "
            f"and group_size % pack_factor == 0 (K={k_dim}, group={group_size}, "
            f"pack={epp}, codebook={codebook is not None})"
        )
        raise ValueError(msg)
    if layout == "magic" and (
        codebook is not None
        or weight_size_bits != 4
        or k_dim % group_size != 0
        or group_size % 8 != 0
    ):
        msg = (
            "magic layout requires 4-bit non-codebook weights with "
            f"K % group_size == 0 and group_size % 8 == 0 (K={k_dim}, "
            f"group={group_size}, bits={weight_size_bits}, codebook={codebook is not None})"
        )
        raise ValueError(msg)

    # Tile sizes: bn lanes, bk along K aligned to both the pack factor and
    # the quantization group, bm >= one sublane tile. Two clean same-window
    # v5e sweeps (tools/drive/exp_int4_gemm.py, m=8, K=4096, N=14336,
    # g=128) agree: (bk=1024, bn=2048) is the decode sweet spot — 581 GB/s
    # vs dense-bf16 806 (72%) in one window, 789 vs 930 (85%) in another —
    # beating both narrower (461 at 1024x1024) and wider tiles (344-480 at
    # bn=3584, 455 at 2048x2048; the earlier wide-N finding was a window
    # artifact). bn must DIVIDE the 128-aligned N so no full-weight jnp.pad
    # runs inside the jitted launcher on every call.
    n128 = round_up(n_dim, 128)
    bm = min(round_up(m_dim, 16), 256)
    if layout == "magic":
        # Whole groups per tile; grow bk toward 2048 while it divides K
        # (bk > 2048 OOMs the 16 MB scoped VMEM at useful bn).
        if block_k is not None:
            bk = block_k
        else:
            bk = group_size
            while bk < 2048 and k_dim % (bk * 2) == 0:
                bk *= 2
        if block_n is not None:
            bn = block_n
        elif (k_dim, n_dim) in _MAGIC_TILE_PINS and bm <= 32:
            # Decode-only pins: they were swept at m=8 (bm=16). At prefill
            # bm=256 the x/acc/out tiles grow ~16x and the pinned bn blows
            # the 16 MB scoped VMEM (engine_benchmark OOM, r5) — fall
            # through to the est-based heuristic there.
            pk, pn = _MAGIC_TILE_PINS[(k_dim, n_dim)]
            bk, bn = (pk if block_k is None else bk), pn
        else:
            # Lane tile: widest divisor whose DOUBLE-BUFFERED weight tile
            # stays <= 8 MB. Wider tiles still "fit" the 16 MB scoped VMEM
            # on paper but measurably lose DMA/compute overlap (r5 sweep,
            # exp_gemm_tiles_r5.log: gateup N=28672 bn7168 573 GB/s vs
            # bn4096 849; lm_head N=129024 bn7168 801 vs bn3584 1062).
            def vmem_est(bn_c: int) -> int:
                return (
                    2 * (bk // 8) * bn_c * 4
                    + 2 * bm * bk * 2
                    + bm * bn_c * 4
                    + 2 * bm * bn_c * 2
                    + 2 * max(bk // group_size, 1) * bn_c * 2
                )

            cands = [d for d in range(128, min(n128, 7168) + 1, 128) if n128 % d == 0]
            fitting = [d for d in cands if vmem_est(d) <= 16_200_000]
            comfy = [d for d in fitting if 2 * (bk // 8) * d * 4 <= 8 * 1024 * 1024]
            bn = max(comfy) if comfy else (max(fitting) if fitting else min(cands))
    else:
        if block_n is not None:
            bn = block_n
        else:
            bn = max(d for d in range(128, min(n128, 2048) + 1, 128) if n128 % d == 0)
        if block_k is not None:
            bk = block_k
        elif layout == "planar":
            # Whole groups per tile (the kernel dequantizes group-at-a-time);
            # grow bk toward 1024 while it still divides K.
            bk = group_size
            while bk < 1024 and k_dim % (bk * 2) == 0:
                bk *= 2
        else:
            bk = 512
            while k_dim % bk != 0 or (bk % group_size != 0 and group_size % bk != 0) or bk % epp != 0:
                bk //= 2
                if bk < 32:
                    bk = group_size  # fall back to one group per tile; pad K below
                    break

    # Pad every operand to tile multiples (zero-padded K contributes nothing
    # because the padded rows of x are zero).
    mp, kp, np_ = round_up(m_dim, bm), round_up(k_dim, bk), round_up(n_dim, bn)
    num_groups = w_s.shape[1] if stacked else w_s.shape[0]
    gp = max(kp // group_size, 1)

    if stacked and ((kp, np_) != (k_dim, n_dim) or gp != num_groups):
        # Padding the (L, ...) stack inside the launcher would materialize
        # a full copy every call — exactly the traffic stacked mode exists
        # to avoid. Pack with pad-free geometry instead
        # (models.linear.padded_out_features).
        msg = (
            f"stacked GEMM requires pad-free tiles: K={k_dim} (tile {bk}), "
            f"N={n_dim} (tile {bn}), groups={num_groups} (need {gp})"
        )
        raise ValueError(msg)
    if (mp, kp) != (m_dim, k_dim):
        x = jnp.pad(x, ((0, mp - m_dim), (0, kp - k_dim)))
    if not stacked:
        if (kp // epp, np_) != w_q_packed.shape:
            w_q_packed = jnp.pad(
                w_q_packed, ((0, kp // epp - w_q_packed.shape[0]), (0, np_ - n_dim))
            )
        if (gp, np_) != w_s.shape:
            w_s = jnp.pad(w_s, ((0, gp - num_groups), (0, np_ - n_dim)), constant_values=1)
        if has_zp and not zero_is_scalar and (gp, np_) != w_zp.shape:
            w_zp = jnp.pad(w_zp, ((0, gp - w_zp.shape[0]), (0, np_ - n_dim)))

    grid = (mp // bm, np_ // bn, kp // bk)

    # Scales/zeros: deliver only this K tile's group rows per step. When a
    # tile holds >=1 whole groups the block is (bk//group_size, 1, bn) at
    # block-row k; when one group spans multiple tiles it is a single row
    # selected by (k*bk)//group_size. Meta arrays are reshaped to
    # (groups, 1, bn) so the *leading* dim carries the group count —
    # Mosaic constrains only the last two block dims (sublane x lane),
    # and (1, bn) is legal for any group_size/bk combo.
    gpt = bk // group_size
    # Meta (scales/zero-points) blocks must put a Mosaic-legal pair in the
    # last two dims. The (.., gpt, 1, bn) reshape trick used elsewhere is a
    # LAYOUT-CHANGING copy of the whole array — executed inside the
    # launcher, i.e. inside the model's layer loop, it re-copied the full
    # (L, gp, N) scale stack every layer (~9 ms/step at Llama-8B, the r4
    # regression). When (gpt, bn) is itself legal (gpt % 8 == 0 or the
    # tile covers all groups), deliver raw 3D/2D blocks with NO reshape.
    meta_direct = gpt >= 1 and (gpt % 8 == 0 or gpt == gp) and layout in ("magic", "planar")
    if stacked:
        num_layers = w_q_packed.shape[0]
        if meta_direct:
            meta_spec = pl.BlockSpec(
                (1, gpt, bn), lambda i, j, k, li: (li[0], k, j), memory_space=pltpu.VMEM
            )

            def meta_operand(a):
                return a  # raw (L, gp, N): zero-copy
        elif gpt >= 1:
            meta_spec = pl.BlockSpec(
                (1, gpt, 1, bn), lambda i, j, k, li: (li[0], k, 0, j), memory_space=pltpu.VMEM
            )

            def meta_operand(a):
                return a.reshape(num_layers, gp, 1, np_)
        else:
            meta_spec = pl.BlockSpec(
                (1, 1, 1, bn),
                lambda i, j, k, li: (li[0], k * bk // group_size, 0, j),
                memory_space=pltpu.VMEM,
            )

            def meta_operand(a):
                return a.reshape(num_layers, gp, 1, np_)

        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, k, li: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, bk // epp, bn), lambda i, j, k, li: (li[0], k, j), memory_space=pltpu.VMEM
            ),
            meta_spec,
        ]
        operands = [x, w_q_packed, meta_operand(w_s)]
        if has_zp:
            if zero_is_scalar:
                in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
                operands.append(w_zp.reshape(1).astype(jnp.float32))
            else:
                in_specs.append(meta_spec)
                operands.append(meta_operand(w_zp))
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            operands.append(jnp.zeros((1,), dtype=jnp.float32))
    else:
        if gpt >= 1:
            meta_spec = pl.BlockSpec((gpt, 1, bn), lambda i, j, k: (k, 0, j), memory_space=pltpu.VMEM)
        else:
            meta_spec = pl.BlockSpec(
                (1, 1, bn), lambda i, j, k: (k * bk // group_size, 0, j), memory_space=pltpu.VMEM
            )

        in_specs = [
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // epp, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            meta_spec,
        ]
        operands = [x, w_q_packed, w_s.reshape(gp, 1, np_)]
        if has_zp:
            if zero_is_scalar:
                in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
                operands.append(w_zp.reshape(1).astype(jnp.float32))
            else:
                in_specs.append(meta_spec)
                operands.append(w_zp.reshape(gp, 1, np_))
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
            operands.append(jnp.zeros((1,), dtype=jnp.float32))

    if layout == "magic":
        kernel = functools.partial(
            _mixed_gemm_magic_kernel,
            weight_bias=weight_bias,
            group_size=group_size,
            bk=bk,
            bn=bn,
            has_zp=has_zp,
            zero_is_scalar=zero_is_scalar,
            num_k=kp // bk,
            stacked=stacked,
            meta_direct=meta_direct,
        )
    elif layout == "planar":
        kernel = functools.partial(
            _mixed_gemm_planar_kernel,
            nbits=weight_size_bits,
            epp=epp,
            weight_bias=weight_bias,
            group_size=group_size,
            bk=bk,
            bn=bn,
            has_zp=has_zp,
            zero_is_scalar=zero_is_scalar,
            num_k=kp // bk,
            stacked=stacked,
            meta_direct=meta_direct,
        )
    else:
        kernel = functools.partial(
            _mixed_gemm_kernel,
            nbits=weight_size_bits,
            epp=epp,
            weight_bias=weight_bias,
            group_size=group_size,
            bk=bk,
            bn=bn,
            has_zp=has_zp,
            zero_is_scalar=zero_is_scalar,
            num_k=kp // bk,
            codebook=codebook,
            stacked=stacked,
        )
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    cost_estimate = pl.CostEstimate(
        flops=2 * mp * np_ * kp,
        bytes_accessed=mp * kp * 2 + kp * np_ // epp * 4 + mp * np_ * 2,
        transcendentals=0,
    )
    if stacked:
        base_kernel = kernel

        def kernel_sp(li_ref, *refs):  # noqa: ARG001 — index maps consume li_ref
            base_kernel(*refs)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec(
                (bm, bn), lambda i, j, k, li: (i, j), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        )
        out = pl.pallas_call(
            kernel_sp,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
            compiler_params=compiler_params,
            cost_estimate=cost_estimate,
            interpret=use_interpret_mode(),
        )(layer_index.astype(jnp.int32).reshape(1), *operands)
    else:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
            grid=grid,
            in_specs=in_specs,
            out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
            compiler_params=compiler_params,
            cost_estimate=cost_estimate,
            interpret=use_interpret_mode(),
        )(*operands)

    return out[:m_dim, :n_dim]


def _mixed_gemm_planar_kernel(
    x_ref,
    b_ref,
    s_ref,
    zp_ref,
    o_ref,
    acc_ref,
    *,
    nbits: int,
    epp: int,
    weight_bias: int,
    group_size: int,
    bk: int,
    bn: int,
    has_zp: bool,
    zero_is_scalar: bool,
    num_k: int,
    stacked: bool = False,
    meta_direct: bool = False,
):
    """Decode-speed mixed GEMM over planar-within-group packing.

    Two VPU-cost wins over the GPTQ-layout kernel (the weight-streaming
    decode path is VPU-bound, not HBM-bound, at full chip bandwidth):

    - *Planar unpack*: bit-field ``i`` of the group's packed words is a
      contiguous (group_size/epp, bn) slab of logical rows, so unpacking
      is shift/mask + a tile-aligned sublane concatenation — none of the
      cross-sublane interleave the GPTQ row layout forces.
    - *Post-dot dequant*: raw codes (exact in bf16) go straight to the
      MXU; per-group scale and zero-point move out of the per-element
      path using ``sum_k x*(c - z)*s = s * (x@c - z * sum_k x)``. The
      per-element work drops to shift+mask+convert (~3 VPU ops) and the
      correction is one (bm, bn) FMA per group.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    mask = (1 << nbits) - 1
    gpt = bk // group_size
    rpg = group_size // epp
    x = x_ref[...]
    packed = b_ref[0] if stacked else b_ref[...]
    for g in range(gpt):
        pw = packed[g * rpg : (g + 1) * rpg]
        fields = [jax.lax.shift_right_logical(pw, nbits * i) & mask for i in range(epp)]
        codes = jnp.concatenate(fields, axis=0)  # (group_size, bn), rows i*rpg + r
        xg = x[:, g * group_size : (g + 1) * group_size]
        part = jnp.dot(xg, codes.astype(x.dtype), preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)  # (bm, 1)
        if stacked:
            sg = s_ref[0, g : g + 1] if meta_direct else s_ref[0, g]
        else:
            sg = s_ref[g]
        sg = sg.astype(jnp.float32)  # (1, bn)
        if has_zp:
            if zero_is_scalar:
                zp = zp_ref[0]
            else:
                if stacked:
                    zp = zp_ref[0, g : g + 1] if meta_direct else zp_ref[0, g]
                else:
                    zp = zp_ref[g]
                zp = zp.astype(jnp.float32)
        else:
            zp = jnp.float32(weight_bias)
        acc_ref[...] += (part - zp * xsum) * sg

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _mixed_gemm_magic_kernel(
    x_ref,
    b_ref,
    s_ref,
    zp_ref,
    o_ref,
    acc_ref,
    *,
    weight_bias: int,
    group_size: int,
    bk: int,
    bn: int,
    has_zp: bool,
    zero_is_scalar: bool,
    num_k: int,
    stacked: bool = False,
    meta_direct: bool = False,
):
    """Decode-speed int4 GEMM over the magic bf16-bitcast packing.

    The unpack costs ~1.4 VPU ops/element and ZERO converts: field ``j``
    of the packed words is masked to the low nibble of each 16-bit half
    and OR'd with 0x4300, so bitcasting the int32 block to bf16 yields
    the exactly-representable values ``128 + code`` directly in the
    sublane-interleaved order the pack anticipated
    (``conch_tpu.utils.quant_utils.pack_rows_magic``). The spurious +128
    rides the existing post-dot zero-point algebra:
    ``sum_k x*(c - z)*s = s * (x@(128+c) - (128+z) * sum_k x)``.

    Measured on v5e (tools/drive/logs/exp_int4_gemm_r4.log, robust
    timer): 733 Gel/s at bk1024/bn2048 and 792 at bk2048/bn7168 vs 601
    for the shift/mask/convert planar kernel at equal tiles — against a
    1012 Gel/s pure-DMA ceiling and a 682 Gel/s XLA-native-int4 dot.
    """
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gpt = bk // group_size
    rpg = group_size // 8
    x = x_ref[...]
    packed = b_ref[0] if stacked else b_ref[...]
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
        codes = jnp.concatenate(slabs, axis=0)  # (group_size, bn) bf16 = 128 + code
        xg = x[:, g * group_size : (g + 1) * group_size]
        part = jnp.dot(xg, codes.astype(x.dtype), preferred_element_type=jnp.float32)
        xsum = jnp.sum(xg.astype(jnp.float32), axis=1, keepdims=True)
        if has_zp:
            if zero_is_scalar:
                zp = zp_ref[0]
            else:
                if stacked:
                    zp = zp_ref[0, g : g + 1] if meta_direct else zp_ref[0, g]
                else:
                    zp = zp_ref[g]
                zp = zp.astype(jnp.float32)
        else:
            zp = jnp.float32(weight_bias)
        if stacked:
            sg = s_ref[0, g : g + 1] if meta_direct else s_ref[0, g]
        else:
            sg = s_ref[g]
        sg = sg.astype(jnp.float32)
        acc_ref[...] += (part - (128.0 + zp) * xsum) * sg

    @pl.when(k == num_k - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _scaled_gemm_kernel(a_ref, b_ref, sa_ref, sb_ref, o_ref, acc_ref, *, num_k: int, int_path: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    if int_path:
        acc_ref[...] += jnp.dot(a_ref[...], b_ref[...], preferred_element_type=jnp.int32)
    else:
        a = a_ref[...].astype(jnp.bfloat16)
        b = b_ref[...].astype(jnp.bfloat16)
        acc_ref[...] += jnp.dot(a, b, preferred_element_type=jnp.float32)

    @pl.when(k == num_k - 1)
    def _():
        scaled = acc_ref[...].astype(jnp.float32) * sa_ref[...] * sb_ref[...]
        o_ref[...] = scaled.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def scaled_gemm_launcher(
    a: jax.Array,
    b: jax.Array,
    scale_a: jax.Array,
    scale_b: jax.Array,
    *,
    out_dtype,
) -> jax.Array:
    """``C = (a @ b) * scale_a[:, None] * scale_b[None, :]`` for int8/fp8 inputs.

    Args:
        a: (M, K) int8 or float8_e4m3fn activations.
        b: (K, N) int8 or float8_e4m3fn weights.
        scale_a: per-row scales, shape (M,), (M, 1) or scalar.
        scale_b: per-column scales, shape (N,), (N, 1) or scalar.

    Returns:
        (M, N) output in ``out_dtype``.
    """
    m_dim, k_dim = a.shape
    _, n_dim = b.shape
    int_path = jnp.issubdtype(a.dtype, jnp.integer)

    # Normalize scales to broadcastable 2D vectors.
    sa = jnp.broadcast_to(scale_a.astype(jnp.float32).reshape(-1, 1), (m_dim, 1)) if scale_a.size > 1 else jnp.full((m_dim, 1), scale_a.astype(jnp.float32).reshape(()))
    sb = jnp.broadcast_to(scale_b.astype(jnp.float32).reshape(1, -1), (1, n_dim)) if scale_b.size > 1 else jnp.full((1, n_dim), scale_b.astype(jnp.float32).reshape(()))

    n128 = round_up(n_dim, 128)
    bn = next(c for c in (1024, 512, 256, 128) if n128 % c == 0)
    bk = 512
    while k_dim % bk != 0 and bk > 128:
        bk //= 2
    bm = min(round_up(m_dim, 32), 256)

    mp, kp, np_ = round_up(m_dim, bm), round_up(k_dim, bk), round_up(n_dim, bn)
    if (mp, kp) != (m_dim, k_dim):
        a = jnp.pad(a, ((0, mp - m_dim), (0, kp - k_dim)))
    if (kp, np_) != (k_dim, n_dim):
        b = jnp.pad(b, ((0, kp - k_dim), (0, np_ - n_dim)))
    if mp != m_dim:
        sa = jnp.pad(sa, ((0, mp - m_dim), (0, 0)))
    if np_ != n_dim:
        sb = jnp.pad(sb, ((0, 0), (0, np_ - n_dim)))

    grid = (mp // bm, np_ // bn, kp // bk)

    out = pl.pallas_call(
        functools.partial(_scaled_gemm_kernel, num_k=kp // bk, int_path=bool(int_path)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, k: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32 if int_path else jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp + kp * np_ + mp * np_ * 2,
            transcendentals=0,
        ),
        interpret=use_interpret_mode(),
    )(a, b, sa, sb)

    return out[:m_dim, :n_dim]
