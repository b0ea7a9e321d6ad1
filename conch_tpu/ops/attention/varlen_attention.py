# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Varlen attention public op (parity: ``conch/ops/attention/varlen_attention.py:180-287``).

The reference's KV-split heuristic and scratchpad allocation
(``:127-140, :246-263``) are CUDA FlashDecoding machinery with no TPU
analog (see the kernel docstring); validation and fp8 handling are kept.
"""

from __future__ import annotations

import math
from typing import Final

import jax
import jax.numpy as jnp

from conch_tpu.kernels.attention.varlen_attention import varlen_attention_launcher

_FP8_KV_DTYPES: Final = ("fp8", "fp8_e4m3")


def _check_size_compatibility(
    query: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    cu_seqlens_q: jax.Array,
    seq_lens: jax.Array,
    block_table: jax.Array,
) -> None:
    expected_q_dims: Final = 3
    if len(query.shape) != expected_q_dims:
        msg = f"Query tensor has unexpected shape ({query.shape = }), expected {expected_q_dims}-D tensor"
        raise ValueError(msg)

    expected_kv_dims: Final = 4
    if len(key_cache.shape) != expected_kv_dims:
        msg = f"key_cache tensor has unexpected shape ({key_cache.shape = }), expected {expected_kv_dims}-D tensor"
        raise ValueError(msg)
    if key_cache.shape != value_cache.shape:
        msg = f"Shape of key_cache and value_cache tensors does not match ({key_cache.shape = }, {value_cache.shape = })"
        raise ValueError(msg)

    _, num_query_heads, head_size = query.shape
    _, num_kv_heads, _, head_size_kv = key_cache.shape
    if head_size_kv != head_size:
        msg = f"Head size of key/value cache ({head_size_kv}) does not match query ({head_size})"
        raise ValueError(msg)
    if num_kv_heads > num_query_heads:
        msg = f"Number of key/value heads ({num_kv_heads}) is greater than number of query heads ({num_query_heads})"
        raise ValueError(msg)

    batch_size = cu_seqlens_q.shape[0] - 1
    if block_table.shape[0] != batch_size:
        msg = f"Batch size from block_table tensor ({block_table.shape[0]}) does not match batch_size ({batch_size})"
        raise ValueError(msg)
    if seq_lens.shape[0] != batch_size:
        msg = f"Shape of sequence lengths tensor does not match batch size ({seq_lens.shape[0]} vs {batch_size})"
        raise ValueError(msg)


def varlen_attention(
    query: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    cu_seqlens_q: jax.Array,
    max_seqlen_q: int,
    seq_lens: jax.Array,
    max_seqlen_k: int,
    block_table: jax.Array,
    causal: bool = False,
    scale: float | None = None,
    softcap: float = 0.0,
    kv_cache_dtype: str = "auto",
    q_scale: jax.Array | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    window_size: int = 0,
    ring_pages: int = 0,
    layer_idx: jax.Array | None = None,
    strict: bool = False,
) -> jax.Array:
    """Variable-length (prefill + decode) attention over a paged KV cache.

    Args:
        query: (total_num_q, num_q_heads, head_size) ragged queries.
        key_cache/value_cache: (num_pages, num_kv_heads, page_size, head).
        cu_seqlens_q: (batch+1,) cumulative query counts.
        max_seqlen_q: max per-sequence query count (static).
        seq_lens: (batch,) KV sequence lengths.
        max_seqlen_k: max KV length (static; informational).
        block_table: (batch, max_pages_per_seq).
        causal: apply causal masking.
        scale: softmax scale; defaults to 1/sqrt(head_size).
        softcap: logit softcap (0 disables).
        kv_cache_dtype: "auto" or "fp8"/"fp8_e4m3".
        q_scale/k_scale/v_scale: fp8 dequantization scales.
        window_size: sliding-window width (each query attends the last
            ``window_size`` positions, itself included; 0 disables).

    Returns:
        (total_num_q, num_q_heads, head_size) output.
    """
    if strict:
        kc_v = key_cache[0] if (layer_idx is not None and key_cache.ndim == 5) else key_cache
        vc_v = value_cache[0] if (layer_idx is not None and value_cache.ndim == 5) else value_cache
        _check_size_compatibility(query, kc_v, vc_v, cu_seqlens_q, seq_lens, block_table)

    head_size = query.shape[-1]
    if scale is None:
        scale = 1.0 / math.sqrt(head_size)

    if kv_cache_dtype in _FP8_KV_DTYPES:
        if key_cache.dtype == jnp.uint8:
            key_cache = jax.lax.bitcast_convert_type(key_cache, jnp.float8_e4m3fn)
            value_cache = jax.lax.bitcast_convert_type(value_cache, jnp.float8_e4m3fn)
    elif kv_cache_dtype not in ("auto", "int8"):
        msg = f"Unsupported kv_cache_dtype: '{kv_cache_dtype}'"
        raise ValueError(msg)

    return varlen_attention_launcher(
        query,
        key_cache,
        value_cache,
        cu_seqlens_q,
        max_seqlen_q,
        seq_lens,
        block_table,
        scale=scale,
        softcap=softcap,
        causal=causal,
        q_scale=q_scale,
        k_scale=k_scale,
        v_scale=v_scale,
        window_size=window_size,
        ring_pages=ring_pages,
        layer_idx=layer_idx,
    )
