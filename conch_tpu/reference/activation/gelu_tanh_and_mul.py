# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pure-jnp golden reference for GeLU-tanh-and-mul (mirrors ``conch/reference/activation/gelu_tanh_and_mul.py``)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

_BETA = math.sqrt(2.0 / math.pi)
_KAPPA = 0.044715


def gelu_tanh_and_mul(x: jax.Array) -> jax.Array:
    """Golden GeGLU reference with the tanh-approximate GeLU."""
    d = x.shape[-1] // 2
    gate = x[..., :d].astype(jnp.float32)
    up = x[..., d:]
    inner = _BETA * (gate + _KAPPA * gate * gate * gate)
    gelu = (0.5 * gate * (1.0 + jnp.tanh(inner))).astype(x.dtype)
    return gelu * up
