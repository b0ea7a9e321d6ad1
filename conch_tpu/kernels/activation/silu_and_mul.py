# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU kernel for SiLU-and-mul (SwiGLU gate).

Re-design of the reference Triton kernel
(``conch/kernels/activation/silu_and_mul.py:57-91``). Computes
``silu(x[..., :d]) * x[..., d:]``. For numerics parity with the reference
(``silu_and_mul.py:45-50``): silu is computed in fp32 and cast back to the
input dtype *before* the gate multiply.

The two halves are passed as separate block-mapped inputs so each grid step
sees aligned (tokens, d) tiles — no in-kernel lane slicing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import cdiv, compute_dtype, round_up, use_interpret_mode
from conch_tpu.kernels.normalization.rms_norm import _pick_block_tokens


def _silu_and_mul_kernel(x_ref, y_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    silu = (x * jax.nn.sigmoid(x)).astype(o_ref.dtype)
    o_ref[...] = silu * y_ref[...]


@jax.jit
def silu_and_mul_parts_launcher(gate: jax.Array, up: jax.Array) -> jax.Array:
    """SwiGLU on separate (num_tokens, d) gate/up halves (TP-friendly)."""
    num_tokens, d = gate.shape
    orig_dtype = gate.dtype
    io_dtype = compute_dtype(orig_dtype)
    gate = gate.astype(io_dtype)
    up = up.astype(io_dtype)

    d_padded = round_up(d, 128)
    if d_padded != d:
        gate = jnp.pad(gate, ((0, 0), (0, d_padded - d)))
        up = jnp.pad(up, ((0, 0), (0, d_padded - d)))

    block_tokens = _pick_block_tokens(num_tokens, d_padded, gate.dtype.itemsize, 3)
    grid = (cdiv(num_tokens, block_tokens),)
    spec = pl.BlockSpec((block_tokens, d_padded), lambda i: (i, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        _silu_and_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((num_tokens, d_padded), gate.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=use_interpret_mode(),
    )(gate, up)

    if d_padded != d:
        out = out[:, :d]
    return out.astype(orig_dtype)


def _fused_halves_launcher(kernel, x: jax.Array) -> jax.Array:
    """Run a gate-activation kernel over both halves of ``x`` in ONE pass.

    ``x[:, :d]`` / ``x[:, d:]`` slices outside the kernel materialize full
    copies (an extra read+write of the whole input — at Llama MLP shapes
    that's ~2x the op's true traffic). Instead the SAME array is passed
    twice with block index maps selecting column-block 0 (gate) and 1 (up),
    so HBM sees exactly one read of x and one write of the output.
    Requires ``d % 128 == 0`` (lane-aligned block boundary).
    """
    num_tokens, two_d = x.shape
    d = two_d // 2
    orig_dtype = x.dtype
    io_dtype = compute_dtype(orig_dtype)
    x = x.astype(io_dtype)

    block_tokens = _pick_block_tokens(num_tokens, d, x.dtype.itemsize, 3)
    grid = (cdiv(num_tokens, block_tokens),)
    left = pl.BlockSpec((block_tokens, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    right = pl.BlockSpec((block_tokens, d), lambda i: (i, 1), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tokens, d), x.dtype),
        grid=grid,
        in_specs=[left, right],
        out_specs=pl.BlockSpec((block_tokens, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=use_interpret_mode(),
    )(x, x)
    return out.astype(orig_dtype)


@jax.jit
def silu_and_mul_launcher(x: jax.Array) -> jax.Array:
    """SwiGLU over a 2D (num_tokens, 2*d) input; returns (num_tokens, d)."""
    d = x.shape[-1] // 2
    if d % 128 == 0:
        return _fused_halves_launcher(_silu_and_mul_kernel, x)
    return silu_and_mul_parts_launcher(x[:, :d], x[:, d:])
