# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""RMS norm public ops (parity: ``conch/ops/normalization/rms_norm.py:11-42``)."""

from __future__ import annotations

import jax

from conch_tpu.kernels.normalization.rms_norm import (
    fused_add_rms_norm_launcher,
    rms_norm_launcher,
)
from conch_tpu.ops.common import fuse_small_op


def rms_norm(x: jax.Array, weight: jax.Array, epsilon: float) -> jax.Array:
    """Root-mean-square normalization.

    Args:
        x: Input tensor, of shape (..., hidden_size).
        weight: Weight tensor, of shape (hidden_size,).
        epsilon: Epsilon value.

    Returns:
        Normalized tensor with the same shape and dtype as ``x``.
    """
    hidden_size = x.shape[-1]
    rows = x.size // hidden_size
    if fuse_small_op(rows):
        from conch_tpu.reference.normalization.rms_norm import rms_norm as _ref

        return _ref(x, weight, epsilon)
    out = rms_norm_launcher(x.reshape(-1, hidden_size), weight, epsilon)
    return out.reshape(x.shape)


def fused_add_rms_norm(
    x: jax.Array,
    residual: jax.Array,
    weight: jax.Array,
    epsilon: float,
) -> tuple[jax.Array, jax.Array]:
    """Residual add fused with RMS norm.

    Functional analog of the reference's in-place op: returns
    ``(rms_norm(x + residual), x + residual)``.

    Args:
        x: Input tensor, of shape (..., hidden_size).
        residual: Residual tensor, of shape (..., hidden_size).
        weight: Weight tensor, of shape (hidden_size,).
        epsilon: Epsilon value.
    """
    hidden_size = x.shape[-1]
    rows = x.size // hidden_size
    if fuse_small_op(rows):
        from conch_tpu.reference.normalization.rms_norm import fused_add_rms_norm as _ref

        return _ref(x, residual, weight, epsilon)
    out, res = fused_add_rms_norm_launcher(
        x.reshape(-1, hidden_size), residual.reshape(-1, hidden_size), weight, epsilon
    )
    return out.reshape(x.shape), res.reshape(x.shape)
