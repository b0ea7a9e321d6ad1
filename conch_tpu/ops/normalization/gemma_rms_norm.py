# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Gemma RMS norm public op (parity: ``conch/ops/normalization/gemma_rms_norm.py:11-24``)."""

from __future__ import annotations

import jax

from conch_tpu.kernels.normalization.gemma_rms_norm import gemma_rms_norm_launcher
from conch_tpu.ops.common import fuse_small_op


def gemma_rms_norm(
    x: jax.Array,
    weight: jax.Array,
    variance_epsilon: float,
    residual: jax.Array | None = None,
) -> jax.Array | tuple[jax.Array, jax.Array]:
    """Gemma RMS norm: ``x * rsqrt(mean(x^2) + eps) * (1 + w)`` in fp32.

    If ``residual`` is given, the residual is added first and the summed
    value is also returned (functional analog of the reference's in-place
    update).
    """
    hidden_size = x.shape[-1]
    if residual is not None:
        x = x + residual
        residual = x
    if fuse_small_op(x.size // hidden_size):
        from conch_tpu.reference.normalization.gemma_rms_norm import gemma_rms_norm as _ref

        out = _ref(x, weight, variance_epsilon)
    else:
        out = gemma_rms_norm_launcher(x.reshape(-1, hidden_size), weight, variance_epsilon)
        out = out.reshape(x.shape)
    return out if residual is None else (out, residual)
