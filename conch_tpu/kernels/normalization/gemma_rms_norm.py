# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU kernel for Gemma-style RMS norm.

Re-design of the reference Triton kernel
(``conch/kernels/normalization/gemma_rms_norm.py:51-82``). Gemma differs from
Llama RMS norm in two ways (reference ``gemma_rms_norm.py:40-48``): the
weight multiply uses ``(1 + w)`` and the *entire* computation stays in fp32
before one final implicit cast back to the input dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import cdiv, compute_dtype, round_up, use_interpret_mode
from conch_tpu.kernels.normalization.rms_norm import _pick_block_tokens


def _gemma_rms_norm_kernel(x_ref, w_ref, o_ref, *, epsilon: float, hidden_size: int):
    x = x_ref[...].astype(jnp.float32)
    mean_sq = jnp.sum(x * x, axis=-1, keepdims=True) / hidden_size
    rms_inv = jax.lax.rsqrt(mean_sq + epsilon)
    w = w_ref[...].astype(jnp.float32)
    o_ref[...] = (x * rms_inv * (1.0 + w)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("epsilon",))
def gemma_rms_norm_launcher(x: jax.Array, weight: jax.Array, epsilon: float) -> jax.Array:
    """Gemma RMS norm over the last axis of a 2D (num_tokens, hidden) input.

    Functional equivalent of the reference's in-place launcher.
    """
    num_tokens, hidden_size = x.shape
    orig_dtype = x.dtype
    io_dtype = compute_dtype(orig_dtype)
    x = x.astype(io_dtype)
    weight = weight.astype(io_dtype)
    hidden_padded = round_up(hidden_size, 128)
    if hidden_padded != hidden_size:
        x = jnp.pad(x, ((0, 0), (0, hidden_padded - hidden_size)))
        weight = jnp.pad(weight, (0, hidden_padded - hidden_size))

    block_tokens = _pick_block_tokens(num_tokens, hidden_padded, x.dtype.itemsize, 2)
    grid = (cdiv(num_tokens, block_tokens),)

    out = pl.pallas_call(
        functools.partial(_gemma_rms_norm_kernel, epsilon=epsilon, hidden_size=hidden_size),
        out_shape=jax.ShapeDtypeStruct((num_tokens, hidden_padded), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_tokens, hidden_padded), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hidden_padded), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_tokens, hidden_padded), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=use_interpret_mode(),
    )(x, weight.reshape(1, hidden_padded))

    if hidden_padded != hidden_size:
        out = out[:, :hidden_size]
    return out.astype(orig_dtype)
