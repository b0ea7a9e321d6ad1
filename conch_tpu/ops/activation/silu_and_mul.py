# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""SiLU-and-mul public op (parity: ``conch/ops/activation/silu_and_mul.py:11-29``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conch_tpu.kernels.activation.silu_and_mul import (
    silu_and_mul_launcher,
    silu_and_mul_parts_launcher,
)
from conch_tpu.ops.common import fuse_small_op


def silu_and_mul(x: jax.Array) -> jax.Array:
    """SwiGLU activation: ``silu(x[..., :d]) * x[..., d:]`` with ``d = x.shape[-1] // 2``.

    Args:
        x: Input of shape (num_tokens, 2*d) or (batch, seq, 2*d).

    Returns:
        Output of shape (..., d).
    """
    two_d = x.shape[-1]
    if fuse_small_op(x.size // two_d):
        from conch_tpu.reference.activation.silu_and_mul import silu_and_mul as _ref

        return _ref(x)
    out = silu_and_mul_launcher(x.reshape(-1, two_d))
    return out.reshape(x.shape[:-1] + (two_d // 2,))


def silu_and_mul_parts(gate: jax.Array, up: jax.Array) -> jax.Array:
    """``silu(gate) * up`` on separate halves (tensor-parallel-friendly:
    column-sharded gate/up stay aligned without a concat)."""
    d = gate.shape[-1]
    if fuse_small_op(gate.size // d):
        gf = gate.astype(jnp.float32)
        silu = (gf * jax.nn.sigmoid(gf)).astype(gate.dtype)
        return silu * up
    out = silu_and_mul_parts_launcher(gate.reshape(-1, d), up.reshape(-1, d))
    return out.reshape(gate.shape)
