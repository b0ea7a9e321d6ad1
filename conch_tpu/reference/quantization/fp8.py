# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Golden reference for fp8 static quant (mirrors ``conch/reference/quantization/fp8.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scaled_fp8_quant(input_tensor: jax.Array, scale: jax.Array) -> jax.Array:
    """Static-scale fp8 quantization to float8_e4m3fn with saturation."""
    scaled = input_tensor.astype(jnp.float32) * (1.0 / scale.astype(jnp.float32).reshape(()))
    return jnp.clip(scaled, -448.0, 448.0).astype(jnp.float8_e4m3fn)
