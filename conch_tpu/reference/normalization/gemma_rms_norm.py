# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pure-jnp golden reference for Gemma RMS norm.

Mirrors ``conch/reference/normalization/gemma_rms_norm.py``: entire
computation in fp32, ``(1 + w)`` weighting, final cast to the input dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gemma_rms_norm(
    x: jax.Array,
    weight: jax.Array,
    variance_epsilon: float,
    residual: jax.Array | None = None,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Golden Gemma RMS norm reference."""
    if residual is not None:
        x = x + residual
        residual = x
    xf = x.astype(jnp.float32)
    mean_sq = jnp.mean(xf * xf, axis=-1, keepdims=True)
    wf = weight.astype(jnp.float32)
    out = (xf * jax.lax.rsqrt(mean_sq + variance_epsilon) * (1.0 + wf)).astype(x.dtype)
    return out if residual is None else (out, residual)
