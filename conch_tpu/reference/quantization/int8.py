# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Golden reference for int8 static quant (mirrors ``conch/reference/quantization/int8.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scaled_int8_quant(input_tensor: jax.Array, scale: jax.Array) -> jax.Array:
    """Static-scale int8 quantization: scale, clamp, truncate-cast."""
    scaled = input_tensor.astype(jnp.float32) * (1.0 / scale.astype(jnp.float32).reshape(()))
    return jnp.clip(scaled, -128.0, 127.0).astype(jnp.int8)
