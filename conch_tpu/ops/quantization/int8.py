# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Int8 quantization public ops (parity: ``conch/ops/quantization/int8.py:11-48``)."""

from __future__ import annotations

import jax

from conch_tpu.kernels.quantization.int8 import static_scaled_int8_quant_launcher


def static_scaled_int8_quant(input_tensor: jax.Array, scale: jax.Array) -> jax.Array:
    """Quantize the input tensor to int8 with a static scalar scale.

    Args:
        input_tensor: Input to scale, shape (num_tokens, hidden_size).
        scale: Static scaling factor, one element.

    Returns:
        int8 tensor of the same shape.
    """
    assert scale.size == 1
    return static_scaled_int8_quant_launcher(input_tensor, scale)


def scaled_int8_quant(
    input_tensor: jax.Array,
    scale: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Scaled int8 quantization (static only, like the reference).

    Returns:
        (quantized int8 tensor, scale).
    """
    if scale is None:
        msg = "Dynamic int8 quantization not yet implemented"
        raise NotImplementedError(msg)
    return static_scaled_int8_quant(input_tensor, scale), scale
