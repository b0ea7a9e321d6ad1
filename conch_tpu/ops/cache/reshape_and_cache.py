# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""reshape_and_cache public op (parity: ``conch/ops/vllm/reshape_and_cache.py:85-126``).

Functional: returns the updated caches (the cache arguments are donated by
the launcher, so under jit this is an in-place scatter with no copy).
"""

from __future__ import annotations

from typing import Final

import jax

from conch_tpu.kernels.cache.reshape_and_cache import (
    reshape_and_cache_launcher,
    reshape_and_cache_stacked_launcher,
)

_SCALED_KV_DTYPES: Final = {"fp8", "fp8_e4m3", "int8"}


def _validate_sizes(
    key: jax.Array,
    value: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    slot_mapping: jax.Array,
) -> None:
    if key.shape != value.shape:
        msg = f"key.shape ({key.shape}) does not match value.shape ({value.shape})"
        raise ValueError(msg)
    expected_kv_dims: Final = 3
    if len(key.shape) != expected_kv_dims:
        msg = f"Number of dimensions in key ({len(key.shape)}) did not match expected ({expected_kv_dims})"
        raise ValueError(msg)
    if key_cache.shape != value_cache.shape:
        msg = f"key_cache.shape ({key_cache.shape}) does not match value_cache.shape ({value_cache.shape})"
        raise ValueError(msg)
    expected_cache_dims: Final = 4
    if len(key_cache.shape) != expected_cache_dims:
        msg = f"Number of dimensions in key cache ({len(key_cache.shape)}) did not match expected ({expected_cache_dims})"
        raise ValueError(msg)
    _, num_kv_heads, head_size = key.shape
    _, num_kv_heads_c, _, head_size_c = key_cache.shape
    if num_kv_heads != num_kv_heads_c:
        msg = f"Number of kv heads in key/value ({num_kv_heads}) does not match cache ({num_kv_heads_c})"
        raise ValueError(msg)
    if head_size != head_size_c:
        msg = f"Head size in key/value ({head_size}) does not match cache ({head_size_c})"
        raise ValueError(msg)
    if len(slot_mapping.shape) != 1:
        msg = f"Number of dimensions in slot mapping ({len(slot_mapping.shape)}) did not match expected (1)"
        raise ValueError(msg)


def reshape_and_cache(
    key: jax.Array,
    value: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    slot_mapping: jax.Array,
    kv_cache_dtype: str = "auto",
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    strict: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Insert new K/V vectors into the paged caches at the mapped slots.

    Args:
        key/value: (num_tokens, num_kv_heads, head_size).
        key_cache/value_cache: (num_pages, num_kv_heads, page_size, head_size).
            These buffers are DONATED; use the returned caches.
        slot_mapping: (num_tokens,) slots; negative entries are skipped.
        kv_cache_dtype: "auto", or "fp8"/"fp8_e4m3" to quantize-on-store
            with the inverted scales.
        k_scale/v_scale: fp8 scales.

    Returns:
        Updated (key_cache, value_cache).
    """
    if strict:
        _validate_sizes(key, value, key_cache, value_cache, slot_mapping)
        if kv_cache_dtype != "auto" and kv_cache_dtype not in _SCALED_KV_DTYPES:
            msg = f"Unsupported kv_cache_dtype: '{kv_cache_dtype}'"
            raise ValueError(msg)

    apply_fp8 = kv_cache_dtype in _SCALED_KV_DTYPES
    return reshape_and_cache_launcher(
        key,
        value,
        key_cache,
        value_cache,
        slot_mapping,
        k_scale,
        v_scale,
        apply_fp8_scaling=apply_fp8,
    )


def reshape_and_cache_stacked(
    key: jax.Array,
    value: jax.Array,
    key_caches: jax.Array,
    value_caches: jax.Array,
    slot_mapping: jax.Array,
    layer_idx: jax.Array,
    kv_cache_dtype: str = "auto",
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """In-place token insertion into STACKED (L, P, KH, ps, D) caches.

    Same semantics as :func:`reshape_and_cache` plus a traced
    ``layer_idx``. The update goes through pallas input_output_aliases so
    carrying the cache pool through a layer ``lax.scan`` copies nothing
    (the xs->ys roundtrip re-stacked ~1 GB per decode step at Llama-8B).
    """
    apply_fp8 = kv_cache_dtype in _SCALED_KV_DTYPES
    return reshape_and_cache_stacked_launcher(
        key, value, key_caches, value_caches, slot_mapping, layer_idx,
        k_scale, v_scale, apply_fp8_scaling=apply_fp8,
    )
