# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Static-scaled fp8 (e4m3) quantization.

Re-design of the reference Triton kernel
(``conch/kernels/quantization/fp8.py:65-97``). On TPU the fp8 format is
always ``float8_e4m3fn`` (the reference picks e4m3fnuz only on ROCm).

The scale-multiply runs in a Pallas kernel in fp32; the final fp8 convert
is done by XLA on the way out (Mosaic fp8 conversion support varies by TPU
generation, and XLA fuses the convert into the store).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import cdiv, compute_dtype, pick_block_rows, round_up, use_interpret_mode


def _static_scaled_fp8_quant_kernel(x_ref, scale_ref, o_ref):
    inverted_scale = 1.0 / scale_ref[0]
    scaled = x_ref[...].astype(jnp.float32) * inverted_scale
    # Saturate to the e4m3fn finite range like the hardware convert does.
    o_ref[...] = jnp.clip(scaled, -448.0, 448.0)


@jax.jit
def static_scaled_fp8_quant_launcher(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Quantize (num_tokens, hidden) to float8_e4m3fn with a scalar static scale."""
    num_tokens, hidden_size = x.shape
    x = x.astype(compute_dtype(x.dtype))
    hidden_padded = round_up(hidden_size, 128)
    if hidden_padded != hidden_size:
        x = jnp.pad(x, ((0, 0), (0, hidden_padded - hidden_size)))

    block_tokens = pick_block_rows(num_tokens, hidden_padded * (x.dtype.itemsize + 4))
    block_tokens = round_up(block_tokens, 32)
    grid = (cdiv(num_tokens, block_tokens),)

    out = pl.pallas_call(
        _static_scaled_fp8_quant_kernel,
        out_shape=jax.ShapeDtypeStruct((num_tokens, hidden_padded), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_tokens, hidden_padded), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((block_tokens, hidden_padded), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=use_interpret_mode(),
    )(x, scale.reshape(1).astype(jnp.float32))

    if hidden_padded != hidden_size:
        out = out[:, :hidden_size]
    return out.astype(jnp.float8_e4m3fn)
