# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Shared helpers for Pallas TPU kernels.

Kernel files follow the reference's import discipline
(``docs/conch/structure.md`` "Kernels"): they may import only
``conch_tpu.platforms`` and this module.
"""

from __future__ import annotations

import functools

import jax


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, multiple: int) -> int:
    """Round ``x`` up to the nearest multiple of ``multiple``."""
    return ((x + multiple - 1) // multiple) * multiple


def next_power_of_2(x: int) -> int:
    """Smallest power of two >= x."""
    return 1 if x <= 1 else 1 << (x - 1).bit_length()


@functools.cache
def use_interpret_mode() -> bool:
    """Whether Pallas kernels should run in interpreter mode.

    True on CPU backends (tests run with ``JAX_PLATFORMS=cpu``) or when
    ``CONCH_FORCE_INTERPRET=1``. On real TPUs kernels compile via Mosaic.
    """
    from conch_tpu import envs

    if envs.CONCH_FORCE_INTERPRET:
        return True
    return jax.default_backend() not in ("tpu", "axon")


def pick_block_rows(num_rows: int, bytes_per_row: int, budget: int = 3 * 1024 * 1024) -> int:
    """Row-block size keeping one block set within a VMEM budget.

    Mosaic double-buffers grid blocks, so the live footprint is ~2x the
    budget; 3 MB per set stays well under the 16 MB VMEM everywhere.
    """
    block = max(8, budget // max(bytes_per_row, 1))
    block = min(block, round_up(num_rows, 8), 1024)
    return round_up(block, 8)


def compute_dtype(dtype):
    """Map a dtype to one Mosaic can compute in.

    TPU Mosaic has no f16 compute path; float16 inputs are upcast to float32
    inside kernels and cast back on store (numerics stay within fp16
    tolerance since fp32 is a superset of fp16 precision).
    """
    import jax.numpy as jnp

    if jnp.dtype(dtype) == jnp.float16 and not use_interpret_mode():
        return jnp.float32
    return dtype


def min_sublane(dtype) -> int:
    """Minimum sublane count (second-to-last dim tile) for ``dtype`` on TPU."""
    import jax.numpy as jnp

    itemsize = jnp.dtype(dtype).itemsize
    return {4: 8, 2: 16, 1: 32}.get(itemsize, 8)


def kv_mxu_dtype(kv_dtype):
    """MXU compute dtype for a KV-cache buffer dtype.

    bf16/f32 feed the MXU directly. fp8 (e4m3) converts to bf16 via
    :func:`cast_kv`'s bit algebra — v5e has no native fp8, and XLA's
    fp8->f32 convert lowers to a scalar ladder that measured ~70 GB/s
    attention vs 698 for int8 on identical geometry
    (tools/drive/logs/kvquant_fp8_ctx8192_r5.log). int8 keeps the native
    int->f32 convert.
    """
    import jax.numpy as jnp

    if kv_dtype in (jnp.bfloat16, jnp.float32):
        return kv_dtype
    if kv_dtype == jnp.float8_e4m3fn:
        return jnp.bfloat16
    return jnp.float32


def cast_kv(x, target):
    """``x.astype(target)`` with an exact bit-algebra fast path for
    fp8e4m3 -> bf16: sign/exponent/mantissa remap (bias 7 -> 127, mantissa
    << 4) for normals plus the exact subnormal path (mant * 2^-9). All
    finite e4m3 values convert exactly; e4m3's single NaN encoding maps to
    a finite value (KV caches never legitimately hold NaN).
    """
    import jax
    import jax.numpy as jnp

    if x.dtype == jnp.float8_e4m3fn and target == jnp.bfloat16:
        bits = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
        sign = (bits >> 7) & 1
        exp = (bits >> 3) & 0xF
        mant = bits & 0x7
        normal = (sign << 15) | ((exp + 120) << 7) | (mant << 4)
        normal_bf16 = jax.lax.bitcast_convert_type(
            normal.astype(jnp.uint16), jnp.bfloat16
        )
        sub = (mant.astype(jnp.float32) * 2.0**-9).astype(jnp.bfloat16)
        sub = jnp.where(sign == 1, -sub, sub)
        return jnp.where(exp == 0, sub, normal_bf16)
    return x.astype(target)
