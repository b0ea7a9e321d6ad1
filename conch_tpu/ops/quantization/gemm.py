# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""GEMM public ops: mixed-precision and scaled matrix multiplication.

Parity with ``conch/ops/quantization/gemm.py:133-252``: metadata deduction
(pack factor, unpack mask, group mode from presence of zero-points),
validation, and launching. Functional: outputs are returned, never written
into caller buffers.
"""

from __future__ import annotations

from typing import Final

import jax
import jax.numpy as jnp

from conch_tpu.kernels.quantization.gemm import (
    ChannelScaleMode,
    MixedPrecisionMatmulMetadata,
    ScaledMatmulMetadata,
    WeightGroupMode,
    mixed_precision_gemm_launcher,
    scaled_gemm_launcher,
)

__all__ = [
    "ChannelScaleMode",
    "MixedPrecisionMatmulMetadata",
    "ScaledMatmulMetadata",
    "WeightGroupMode",
    "create_mixed_precision_metadata",
    "create_scaled_metadata",
    "mixed_precision_gemm",
    "scaled_gemm",
]


def _deduce_weight_group_mode(w_zp: jax.Array | None) -> WeightGroupMode:
    return WeightGroupMode.SYMMETRIC_NO_SHIFT if w_zp is None else WeightGroupMode.SYMMETRIC_WITH_SHIFT


def create_mixed_precision_metadata(
    x: jax.Array,
    w_q_packed: jax.Array,
    w_s: jax.Array,
    w_zp: jax.Array | None,
    weight_size_bits: int,
    weight_bias: int,
    group_size: int,
    *,
    output_dtype=None,
    acc_dtype=None,
    meta_dtype=None,
    scaled_activations: bool = False,
    strict: bool = False,
) -> MixedPrecisionMatmulMetadata:
    """Verify shapes/dtypes and deduce metadata (parity: reference ``gemm.py:41-130``)."""
    expected_rank: Final = 2
    if strict:
        for name, t in (("x", x), ("w_q_packed", w_q_packed), ("w_s", w_s)):
            if len(t.shape) != expected_rank:
                msg = f"Unexpected number of dimensions of input tensor {name}: {len(t.shape)}"
                raise ValueError(msg)
        if w_zp is not None and w_zp.size > 1 and len(w_zp.shape) != expected_rank:
            msg = f"Unexpected number of dimensions of input tensor w_zp: {len(w_zp.shape)}"
            raise ValueError(msg)
        if w_q_packed.dtype not in (jnp.int32, jnp.uint32):
            msg = f"Invalid datatype for packed weights: {w_q_packed.dtype}"
            raise ValueError(msg)
        if scaled_activations:
            msg = "Scaled activations not yet implemented"
            raise NotImplementedError(msg)

    packed_bitwidth: Final = 32
    elements_per_sample = packed_bitwidth // weight_size_bits
    m_dim, k_dim = x.shape
    _, n_dim = w_q_packed.shape
    zero_is_scalar = False if w_zp is None else w_zp.size == 1

    if strict:
        expected_scales_shape = (k_dim // group_size, n_dim)
        if tuple(w_s.shape) != expected_scales_shape:
            msg = f"Invalid w_s shape (expected: {expected_scales_shape}, actual: {tuple(w_s.shape)})"
            raise ValueError(msg)
        if w_zp is not None and not zero_is_scalar and tuple(w_zp.shape) != expected_scales_shape:
            msg = f"Invalid w_zp shape (expected: {expected_scales_shape}, actual: {tuple(w_zp.shape)})"
            raise ValueError(msg)

    return MixedPrecisionMatmulMetadata(
        m_dim=m_dim,
        k_dim=k_dim,
        n_dim=n_dim,
        weight_size_bits=weight_size_bits,
        weight_bias=weight_bias,
        group_size=group_size,
        elements_per_sample=elements_per_sample,
        zero_is_scalar=zero_is_scalar,
        unpack_mask=2**weight_size_bits - 1,
        input_dtype=x.dtype,
        output_dtype=x.dtype if output_dtype is None else output_dtype,
        acc_dtype=jnp.float32 if acc_dtype is None else acc_dtype,
        meta_dtype=x.dtype if meta_dtype is None else meta_dtype,
        channel_scale_mode=ChannelScaleMode.NONE,
        weight_group_mode=_deduce_weight_group_mode(w_zp),
    )


def mixed_precision_gemm(
    x: jax.Array,
    w_q_packed: jax.Array,
    w_s: jax.Array,
    w_zp: jax.Array | None,
    weight_size_bits: int,
    weight_bias: int,
    group_size: int,
    *,
    output_dtype=None,
    acc_dtype=None,
    meta_dtype=None,
    scaled_activations: bool = False,
    strict: bool = False,
    codebook: tuple[float, ...] | None = None,
    layout: str = "gptq",
    layer_index: jax.Array | None = None,
) -> jax.Array:
    """Mixed-precision GEMM: ``x @ dequant(w_q_packed)``.

    Args:
        x: (M, K) activations.
        w_q_packed: (K // pack_factor, N) int32-packed quantized weights.
        w_s: (K // group_size, N) per-group scales.
        w_zp: optional per-group zero-points (or scalar).
        weight_size_bits: weight bit-width (2/4/8).
        weight_bias: bias subtracted after unpacking (e.g. 8 for uint4b8).
        group_size: quantization group size along K.
        codebook: optional 16-entry table for codebook formats (NF4/FP4);
            fused in-kernel dequant, ``weight_bias`` ignored.
        layout: packed-word layout — "gptq" (reference row-interleaved) or
            "planar" (TPU-fast within-group planar packing, see
            ``conch_tpu.utils.quant_utils.pack_rows_planar``).
        layer_index: scalar layer selector for stacked (L, ...) weights;
            rides Pallas scalar prefetch so no slice is materialized (see
            the launcher docstring).
    """
    metadata = create_mixed_precision_metadata(
        x,
        w_q_packed[0] if w_q_packed.ndim == 3 else w_q_packed,
        w_s[0] if w_s.ndim == 3 else w_s,
        w_zp,
        weight_size_bits,
        weight_bias,
        group_size,
        output_dtype=output_dtype,
        acc_dtype=acc_dtype,
        meta_dtype=meta_dtype,
        scaled_activations=scaled_activations,
        strict=strict,
    )
    return mixed_precision_gemm_launcher(
        x,
        w_q_packed,
        w_s,
        w_zp,
        weight_size_bits=weight_size_bits,
        weight_bias=weight_bias,
        group_size=group_size,
        zero_is_scalar=metadata.zero_is_scalar,
        out_dtype=metadata.output_dtype,
        codebook=codebook,
        layout=layout,
        layer_index=layer_index,
    )


def create_scaled_metadata(
    a: jax.Array,
    b: jax.Array,
    scale_a: jax.Array,
    scale_b: jax.Array,
    output_dtype,
    strict: bool = False,
) -> ScaledMatmulMetadata:
    """Verify shapes/dtypes and deduce metadata (parity: reference ``gemm.py:171-230``)."""
    expected_rank: Final = 2
    if strict:
        for name, t in (("a", a), ("b", b)):
            if len(t.shape) != expected_rank:
                msg = f"Unexpected number of dimensions of input tensor {name}: {len(t.shape)}"
                raise ValueError(msg)
        if a.dtype != b.dtype:
            msg = f"Input tensors a and b must have the same datatype (a: {a.dtype}, b: {b.dtype})"
            raise ValueError(msg)

    m_dim, k_dim = a.shape
    _, n_dim = b.shape

    if strict:
        if scale_a.size != 1 and scale_a.shape[0] != m_dim:
            msg = f"Invalid scale_a shape (expected: ({m_dim},), actual: {tuple(scale_a.shape)})"
            raise ValueError(msg)
        if scale_b.size != 1 and scale_b.shape[0] != n_dim:
            msg = f"Invalid scale_b shape (expected: ({n_dim},), actual: {tuple(scale_b.shape)})"
            raise ValueError(msg)

    return ScaledMatmulMetadata(
        m_dim=m_dim,
        k_dim=k_dim,
        n_dim=n_dim,
        input_dtype=a.dtype,
        output_dtype=output_dtype,
        acc_dtype=jnp.float32 if jnp.issubdtype(a.dtype, jnp.floating) else jnp.int32,
        meta_dtype=scale_a.dtype,
        channel_scale_mode=ChannelScaleMode.WEIGHT_AND_ACTIVATION,
        weight_group_mode=WeightGroupMode.NONE,
    )


def scaled_gemm(
    a: jax.Array,
    b: jax.Array,
    scale_a: jax.Array,
    scale_b: jax.Array,
    output_dtype,
    bias: jax.Array | None = None,
    strict: bool = False,
) -> jax.Array:
    """Scaled GEMM: ``(a @ b) * scale_a * scale_b (+ bias)`` for int8/fp8 inputs.

    Args:
        a: (M, K) int8 or fp8 activations.
        b: (K, N) int8 or fp8 weights.
        scale_a: per-row activation scales (M,) or scalar.
        scale_b: per-column weight scales (N,) or scalar.
        output_dtype: output dtype.
        bias: optional (N,) bias added after scaling.
    """
    create_scaled_metadata(a, b, scale_a, scale_b, output_dtype, strict=strict)
    output = scaled_gemm_launcher(a, b, scale_a, scale_b, out_dtype=output_dtype)
    if bias is not None:
        output = output + bias
    return output
