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
