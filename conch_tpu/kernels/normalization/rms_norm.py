# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU kernels for Llama-style RMS norm (+ fused residual add).

TPU-native re-design of the reference Triton kernels
(``conch/kernels/normalization/rms_norm.py:65-158``): instead of one program
per token row with pointer arithmetic, we tile (tokens, hidden) blocks onto
the VPU via BlockSpecs and reduce along the lane (hidden) axis. Numerics
match the reference exactly: the mean-of-squares and rsqrt are computed in
fp32, the normalized value is cast back to the input dtype *before* the
weight multiply (reference ``rms_norm.py:55-61``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import cdiv, compute_dtype, round_up, use_interpret_mode


def _pick_block_tokens(num_tokens: int, hidden_padded: int, itemsize: int, num_bufs: int) -> int:
    """Token-block size keeping all row buffers within the VMEM budget."""
    from conch_tpu.kernels.common import pick_block_rows

    return pick_block_rows(num_tokens, hidden_padded * itemsize * num_bufs)


def _rms_norm_kernel(x_ref, w_ref, o_ref, *, epsilon: float, hidden_size: int):
    x = x_ref[...].astype(jnp.float32)
    mean_sq = jnp.sum(x * x, axis=-1, keepdims=True) / hidden_size
    rms_inv = jax.lax.rsqrt(mean_sq + epsilon)
    normalized = (x * rms_inv).astype(o_ref.dtype)
    o_ref[...] = normalized * w_ref[...].astype(o_ref.dtype)


def _fused_add_rms_norm_kernel(x_ref, r_ref, w_ref, o_ref, r_out_ref, *, epsilon: float, hidden_size: int):
    x = x_ref[...] + r_ref[...]
    r_out_ref[...] = x
    xf = x.astype(jnp.float32)
    mean_sq = jnp.sum(xf * xf, axis=-1, keepdims=True) / hidden_size
    rms_inv = jax.lax.rsqrt(mean_sq + epsilon)
    normalized = (xf * rms_inv).astype(o_ref.dtype)
    o_ref[...] = normalized * w_ref[...].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("epsilon",))
def rms_norm_launcher(x: jax.Array, weight: jax.Array, epsilon: float) -> jax.Array:
    """RMS norm over the last axis of a 2D (num_tokens, hidden) input."""
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
        functools.partial(_rms_norm_kernel, epsilon=epsilon, hidden_size=hidden_size),
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


@functools.partial(jax.jit, static_argnames=("epsilon",))
def fused_add_rms_norm_launcher(
    x: jax.Array, residual: jax.Array, weight: jax.Array, epsilon: float
) -> tuple[jax.Array, jax.Array]:
    """Fused residual-add + RMS norm.

    Functional equivalent of the reference's in-place launcher
    (``rms_norm.py:113-158``): returns ``(normalized, x + residual)``.
    """
    num_tokens, hidden_size = x.shape
    orig_dtype = x.dtype
    io_dtype = compute_dtype(orig_dtype)
    x = x.astype(io_dtype)
    residual = residual.astype(io_dtype)
    weight = weight.astype(io_dtype)
    hidden_padded = round_up(hidden_size, 128)
    if hidden_padded != hidden_size:
        x = jnp.pad(x, ((0, 0), (0, hidden_padded - hidden_size)))
        residual = jnp.pad(residual, ((0, 0), (0, hidden_padded - hidden_size)))
        weight = jnp.pad(weight, (0, hidden_padded - hidden_size))

    block_tokens = _pick_block_tokens(num_tokens, hidden_padded, x.dtype.itemsize, 4)
    grid = (cdiv(num_tokens, block_tokens),)
    row_spec = pl.BlockSpec((block_tokens, hidden_padded), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out, res_out = pl.pallas_call(
        functools.partial(_fused_add_rms_norm_kernel, epsilon=epsilon, hidden_size=hidden_size),
        out_shape=(
            jax.ShapeDtypeStruct((num_tokens, hidden_padded), x.dtype),
            jax.ShapeDtypeStruct((num_tokens, hidden_padded), x.dtype),
        ),
        grid=grid,
        in_specs=[
            row_spec,
            row_spec,
            pl.BlockSpec((1, hidden_padded), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(row_spec, row_spec),
        interpret=use_interpret_mode(),
    )(x, residual, weight.reshape(1, hidden_padded))

    if hidden_padded != hidden_size:
        out = out[:, :hidden_size]
        res_out = res_out[:, :hidden_size]
    return out.astype(orig_dtype), res_out.astype(orig_dtype)
