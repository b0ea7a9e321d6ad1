# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pure-jnp golden reference for RMS norm.

Mirrors the reference PyTorch implementation
(``conch/reference/normalization/rms_norm.py``): fp32 mean-of-squares,
cast back to the input dtype before the weight multiply.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jax.Array, weight: jax.Array, epsilon: float) -> jax.Array:
    """Golden RMS norm reference."""
    xf = x.astype(jnp.float32)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normalized = (xf * jax.lax.rsqrt(mean_sq + epsilon)).astype(x.dtype)
    return normalized * weight.astype(x.dtype)


def fused_add_rms_norm(
    x: jax.Array, residual: jax.Array, weight: jax.Array, epsilon: float
) -> tuple[jax.Array, jax.Array]:
    """Golden fused-add RMS norm reference."""
    summed = x + residual
    return rms_norm(summed, weight, epsilon), summed
