# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pure-jnp golden reference for SiLU-and-mul (mirrors ``conch/reference/activation/silu_and_mul.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu_and_mul(x: jax.Array) -> jax.Array:
    """Golden SwiGLU reference: fp32 silu cast back before the gate multiply."""
    d = x.shape[-1] // 2
    gate = x[..., :d].astype(jnp.float32)
    up = x[..., d:]
    silu = (gate * jax.nn.sigmoid(gate)).astype(x.dtype)
    return silu * up
