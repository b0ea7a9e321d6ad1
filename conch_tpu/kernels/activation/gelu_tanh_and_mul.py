# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU kernel for GeLU-tanh-and-mul (GeGLU gate).

Re-design of the reference Triton kernel
(``conch/kernels/activation/gelu_tanh_and_mul.py:71-105``). Computes the
tanh-approximate GeLU of the first half times the second half:
``0.5 * x * (1 + tanh(beta * (x + kappa * x^3))) * y`` with
``beta = sqrt(2/pi)`` and ``kappa = 0.044715`` (reference ``:83-84``).
The activation is evaluated in fp32 for accuracy and cast back before the
gate multiply.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import cdiv, compute_dtype, round_up, use_interpret_mode
from conch_tpu.kernels.normalization.rms_norm import _pick_block_tokens

_BETA = math.sqrt(2.0 / math.pi)
_KAPPA = 0.044715


def _gelu_tanh_and_mul_kernel(x_ref, y_ref, o_ref):
    x = x_ref[...].astype(jnp.float32)
    inner = _BETA * (x + _KAPPA * x * x * x)
    # 0.5 * (1 + tanh(u)) == sigmoid(2u): one exp + one reciprocal on the
    # VPU instead of tanh's rational-approximation ladder.
    gelu = (x * jax.nn.sigmoid(2.0 * inner)).astype(o_ref.dtype)
    o_ref[...] = gelu * y_ref[...]


@jax.jit
def gelu_tanh_and_mul_parts_launcher(gate: jax.Array, up: jax.Array) -> jax.Array:
    """GeGLU on separate (num_tokens, d) gate/up halves (TP-friendly)."""
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
        _gelu_tanh_and_mul_kernel,
        out_shape=jax.ShapeDtypeStruct((num_tokens, d_padded), gate.dtype),
        grid=grid,
        in_specs=[spec, spec],
        out_specs=spec,
        interpret=use_interpret_mode(),
    )(gate, up)

    if d_padded != d:
        out = out[:, :d]
    return out.astype(orig_dtype)


@jax.jit
def gelu_tanh_and_mul_launcher(x: jax.Array) -> jax.Array:
    """GeGLU over a 2D (num_tokens, 2*d) input; returns (num_tokens, d)."""
    from conch_tpu.kernels.activation.silu_and_mul import _fused_halves_launcher

    d = x.shape[-1] // 2
    if d % 128 == 0:
        return _fused_halves_launcher(_gelu_tanh_and_mul_kernel, x)
    return gelu_tanh_and_mul_parts_launcher(x[:, :d], x[:, d:])
