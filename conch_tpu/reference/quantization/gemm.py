# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Golden jnp references for mixed-precision and scaled GEMM.

Mirrors ``conch/reference/quantization/scaled_gemm.py`` and the dequant
semantics of the reference kernel (``conch/kernels/quantization/gemm.py:380-440``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def mixed_precision_gemm(
    x: jax.Array,
    w_q_packed: np.ndarray,
    w_s: jax.Array,
    w_zp: jax.Array | None,
    weight_size_bits: int,
    weight_bias: int,
    group_size: int,
) -> jax.Array:
    """Unpack, dequantize fully, then one dense matmul (golden path)."""
    from conch_tpu.utils.quant_utils import unpack_rows

    k_dim = x.shape[1]
    codes = jnp.asarray(unpack_rows(np.asarray(w_q_packed), weight_size_bits, k_dim).astype(np.int32))
    w = codes.astype(jnp.float32) - weight_bias
    if w_zp is not None:
        zp = jnp.repeat(w_zp.astype(jnp.float32), group_size, axis=0) if w_zp.size > 1 else w_zp.reshape(())
        w = w - zp
    scales = jnp.repeat(w_s.astype(jnp.float32), group_size, axis=0)
    w = (w * scales).astype(x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def scaled_gemm(
    a: jax.Array,
    b: jax.Array,
    scale_a: jax.Array,
    scale_b: jax.Array,
    output_dtype,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Golden scaled GEMM: full-precision matmul then channel scaling."""
    if jnp.issubdtype(a.dtype, jnp.integer):
        acc = jnp.dot(a.astype(jnp.int32), b.astype(jnp.int32), preferred_element_type=jnp.int32)
    else:
        acc = jnp.dot(a.astype(jnp.float32), b.astype(jnp.float32), preferred_element_type=jnp.float32)
    sa = scale_a.astype(jnp.float32).reshape(-1, 1) if scale_a.size > 1 else scale_a.astype(jnp.float32).reshape(())
    sb = scale_b.astype(jnp.float32).reshape(1, -1) if scale_b.size > 1 else scale_b.astype(jnp.float32).reshape(())
    out = acc.astype(jnp.float32) * sa * sb
    if bias is not None:
        out = out + bias
    return out.astype(output_dtype)
