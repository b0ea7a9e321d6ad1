# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU kernel for static-scaled int8 quantization.

Re-design of the reference Triton kernel
(``conch/kernels/quantization/int8.py:63-97``): multiply by the inverted
static scale, clamp to the int8 range, truncate-cast to int8 (torch ``.to``
semantics, reference ``int8.py:46-58``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import cdiv, compute_dtype, pick_block_rows, round_up, use_interpret_mode


def _static_scaled_int8_quant_kernel(x_ref, scale_ref, o_ref):
    inverted_scale = 1.0 / scale_ref[0]
    scaled = x_ref[...].astype(jnp.float32) * inverted_scale
    clamped = jnp.clip(scaled, -128.0, 127.0)
    o_ref[...] = clamped.astype(jnp.int8)  # truncation toward zero, like torch .to(int8)


@jax.jit
def static_scaled_int8_quant_launcher(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Quantize (num_tokens, hidden) to int8 with a scalar static scale."""
    num_tokens, hidden_size = x.shape
    x = x.astype(compute_dtype(x.dtype))
    hidden_padded = round_up(hidden_size, 128)
    if hidden_padded != hidden_size:
        x = jnp.pad(x, ((0, 0), (0, hidden_padded - hidden_size)))

    block_tokens = pick_block_rows(num_tokens, hidden_padded * (x.dtype.itemsize + 1))
    block_tokens = round_up(block_tokens, 32)  # int8 output sublane tile
    grid = (cdiv(num_tokens, block_tokens),)

    out = pl.pallas_call(
        _static_scaled_int8_quant_kernel,
        out_shape=jax.ShapeDtypeStruct((num_tokens, hidden_padded), jnp.int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_tokens, hidden_padded), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_tokens, hidden_padded), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=use_interpret_mode(),
    )(x, scale.reshape(1).astype(jnp.float32))

    return out[:, :hidden_size] if hidden_padded != hidden_size else out
