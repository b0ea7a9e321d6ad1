# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""GeLU-tanh-and-mul public op (parity: ``conch/ops/activation/gelu_tanh_and_mul.py:12-20``)."""

from __future__ import annotations

import jax

from conch_tpu.kernels.activation.gelu_tanh_and_mul import (
    gelu_tanh_and_mul_launcher,
    gelu_tanh_and_mul_parts_launcher,
)


def gelu_tanh_and_mul(x: jax.Array) -> jax.Array:
    """GeGLU activation: ``gelu_tanh(x[..., :d]) * x[..., d:]`` with ``d = x.shape[-1] // 2``.

    Args:
        x: Input of shape (num_tokens, 2*d) or (batch, seq, 2*d).

    Returns:
        Output of shape (..., d).
    """
    two_d = x.shape[-1]
    out = gelu_tanh_and_mul_launcher(x.reshape(-1, two_d))
    return out.reshape(x.shape[:-1] + (two_d // 2,))


def gelu_tanh_and_mul_parts(gate: jax.Array, up: jax.Array) -> jax.Array:
    """``gelu_tanh(gate) * up`` on separate halves (tensor-parallel-friendly)."""
    d = gate.shape[-1]
    out = gelu_tanh_and_mul_parts_launcher(gate.reshape(-1, d), up.reshape(-1, d))
    return out.reshape(gate.shape)
