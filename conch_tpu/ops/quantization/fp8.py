# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""FP8 quantization public ops (parity: ``conch/ops/quantization/fp8.py:12-58``)."""

from __future__ import annotations

import jax

from conch_tpu.kernels.quantization.fp8 import static_scaled_fp8_quant_launcher


def static_scaled_fp8_quant(input_tensor: jax.Array, scale: jax.Array) -> jax.Array:
    """Quantize the input tensor to float8_e4m3fn with a static scalar scale.

    Args:
        input_tensor: Input to scale, shape (num_tokens, hidden_size).
        scale: Static scaling factor, one element.

    Returns:
        float8_e4m3fn tensor of the same shape.
    """
    assert scale.size == 1
    return static_scaled_fp8_quant_launcher(input_tensor, scale)


def scaled_fp8_quant(
    input_tensor: jax.Array,
    scale: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Scaled fp8 quantization (static only, like the reference).

    Returns:
        (quantized fp8 tensor, scale).
    """
    if scale is None:
        msg = "Dynamic fp8 quantization not implemented yet"
        raise NotImplementedError(msg)
    return static_scaled_fp8_quant(input_tensor, scale), scale
