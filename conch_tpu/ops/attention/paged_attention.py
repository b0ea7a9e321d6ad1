# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Paged attention public op (parity: ``conch/ops/attention/paged_attention.py:14-235``).

The reference's scratchpad allocation and KV-split heuristic
(``:103-123, :205-217``) are CUDA-specific (FlashDecoding across SMs) and
intentionally absent: the TPU kernel makes a single online-softmax pass
with pipelined page DMAs (see ``conch_tpu/kernels/attention/paged_attention.py``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Final

import jax
import jax.numpy as jnp

from conch_tpu.kernels.attention.paged_attention import paged_attention_launcher

_FP8_KV_DTYPES: Final = ("fp8", "fp8_e4m3")


@dataclass
class PagedAttentionMetadata:
    """Shape metadata (parity: reference ``paged_attention.py:14-24``)."""

    batch_size: int
    num_query_heads: int
    num_kv_heads: int
    head_size: int
    num_cache_blocks: int
    max_num_blocks_per_sequence: int


def _check_size_compatibility(
    query: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    block_table: jax.Array,
) -> PagedAttentionMetadata:
    expected_q_dims: Final = 3
    if len(query.shape) != expected_q_dims:
        msg = f"Query tensor has unexpected shape ({query.shape = }), expected {expected_q_dims}-D tensor"
        raise ValueError(msg)

    expected_kv_dims: Final = 4
    if len(key_cache.shape) != expected_kv_dims:
        msg = f"key_cache tensor has unexpected shape ({key_cache.shape = }), expected {expected_kv_dims}-D tensor"
        raise ValueError(msg)
    if key_cache.shape != value_cache.shape:
        msg = f"Shape of key and value cache tensors do not match ({key_cache.shape = }, {value_cache.shape = })"
        raise ValueError(msg)

    batch_size, num_query_heads, head_size = query.shape
    num_cache_blocks, num_kv_heads, _, head_size_kv = key_cache.shape
    if head_size_kv != head_size:
        msg = f"Head size of kv cache ({head_size_kv}) does not match query ({head_size})"
        raise ValueError(msg)
    if num_query_heads % num_kv_heads != 0:
        msg = f"num_query_heads ({num_query_heads}) not divisible by num_kv_heads ({num_kv_heads})"
        raise ValueError(msg)
    if block_table.shape[0] != batch_size:
        msg = (
            f"Batch size from block_table tensor ({block_table.shape[0]}) does not match "
            f"batch_size from query tensor ({batch_size})"
        )
        raise ValueError(msg)

    return PagedAttentionMetadata(
        batch_size=batch_size,
        num_query_heads=num_query_heads,
        num_kv_heads=num_kv_heads,
        head_size=head_size,
        num_cache_blocks=num_cache_blocks,
        max_num_blocks_per_sequence=block_table.shape[1],
    )


def paged_attention(
    query: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    block_table: jax.Array,
    seq_lens: jax.Array,
    scale: float | None = None,
    softcap: float = 0.0,
    kv_cache_dtype: str = "auto",
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    window_size: int = 0,
    ring_pages: int = 0,
    layer_idx: jax.Array | None = None,
) -> jax.Array:
    """Decode-only paged attention over a paged KV cache.

    Args:
        query: (batch, num_q_heads, head_size) - one token per sequence.
        key_cache/value_cache: (num_pages, num_kv_heads, page_size, head_size).
        block_table: (batch, max_pages_per_seq) physical page ids.
        seq_lens: (batch,) sequence lengths.
        scale: softmax scale; defaults to 1/sqrt(head_size).
        softcap: logit softcap (0 disables).
        window_size: sliding-window width (the query attends only the
            last ``window_size`` cache positions; 0 disables).
        kv_cache_dtype: "auto" or "fp8"/"fp8_e4m3" (uint8 caches are
            bitcast to float8_e4m3fn).
        k_scale/v_scale: fp8 dequantization scales.

    Returns:
        (batch, num_q_heads, head_size) attention output.
    """
    # Stacked (L, P, KH, ps, D) caches validate on the trailing 4 dims.
    kc_v = key_cache[0] if (layer_idx is not None and key_cache.ndim == 5) else key_cache
    vc_v = value_cache[0] if (layer_idx is not None and value_cache.ndim == 5) else value_cache
    metadata = _check_size_compatibility(query, kc_v, vc_v, block_table)
    if scale is None:
        scale = 1.0 / math.sqrt(metadata.head_size)

    if kv_cache_dtype in _FP8_KV_DTYPES:
        if key_cache.dtype == jnp.uint8:
            key_cache = jax.lax.bitcast_convert_type(key_cache, jnp.float8_e4m3fn)
            value_cache = jax.lax.bitcast_convert_type(value_cache, jnp.float8_e4m3fn)
    elif kv_cache_dtype not in ("auto", "int8"):
        # int8 caches need no bitcast: the kernel's astype(f32) * scale
        # dequant handles integer storage identically.
        msg = f"Unsupported kv_cache_dtype: '{kv_cache_dtype}'"
        raise ValueError(msg)

    return paged_attention_launcher(
        query,
        key_cache,
        value_cache,
        block_table,
        seq_lens,
        scale=scale,
        softcap=softcap,
        k_scale=k_scale,
        v_scale=v_scale,
        window_size=window_size,
        ring_pages=ring_pages,
        layer_idx=layer_idx,
    )
