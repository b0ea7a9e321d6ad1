# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Golden jnp reference attention over paged KV caches.

Mirrors the reference's from-scratch PyTorch attention used by its tests
(``tests/varlen_attention_test.py:106-212``): gather the paged cache back
to contiguous per-sequence K/V, then a plain masked softmax attention in
fp32 (no online softmax), computed per sequence.
"""

from __future__ import annotations

import jax
import numpy as np


def gather_cache_for_sequence(
    cache: np.ndarray, block_table_row: np.ndarray, seq_len: int
) -> np.ndarray:
    """Gather one sequence's (seq_len, kv_heads, head) from a paged cache.

    Cache layout: (num_pages, num_kv_heads, page_size, head_size).
    """
    num_pages, num_kv_heads, page_size, head_size = cache.shape
    num_needed = -(-seq_len // page_size)
    pages = cache[block_table_row[:num_needed]]  # (n, KH, ps, D)
    contiguous = pages.transpose(0, 2, 1, 3).reshape(num_needed * page_size, num_kv_heads, head_size)
    return contiguous[:seq_len]


def masked_attention(
    q: np.ndarray,  # (q_len, QH, D)
    k: np.ndarray,  # (k_len, KH, D)
    v: np.ndarray,  # (k_len, KH, D)
    scale: float,
    causal: bool,
    softcap: float = 0.0,
    window_size: int = 0,
) -> np.ndarray:
    """Plain fp32 softmax attention for one sequence (GQA-aware)."""
    q_len, num_q_heads, _ = q.shape
    k_len, num_kv_heads, _ = k.shape
    group = num_q_heads // num_kv_heads

    q = q.astype(np.float32)
    k = np.repeat(k.astype(np.float32), group, axis=1)  # (k_len, QH, D)
    v = np.repeat(v.astype(np.float32), group, axis=1)

    # (QH, q_len, k_len)
    s = np.einsum("qhd,khd->hqk", q, k) * scale
    if softcap > 0.0:
        s = softcap * np.tanh(s / softcap)

    q_pos = k_len - q_len + np.arange(q_len)
    mask = np.ones((q_len, k_len), bool)
    if causal:
        mask &= np.arange(k_len)[None, :] <= q_pos[:, None]  # (q_len, k_len)
    if window_size > 0:
        # Sliding window: each query sees at most the last `window_size`
        # positions (inclusive of itself): k_pos > q_pos - window_size.
        mask &= np.arange(k_len)[None, :] > q_pos[:, None] - window_size
    if causal or window_size > 0:
        s = np.where(mask[None, :, :], s, -np.inf)

    s = s - s.max(axis=-1, keepdims=True)
    p = np.exp(s)
    p /= p.sum(axis=-1, keepdims=True)
    out = np.einsum("hqk,khd->qhd", p, v)
    return out


def paged_attention(
    query: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    block_table: jax.Array,
    seq_lens: jax.Array,
    scale: float,
    softcap: float = 0.0,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    window_size: int = 0,
) -> np.ndarray:
    """Golden decode attention: one query token per sequence."""
    q = np.asarray(query, dtype=np.float32)
    kc = np.asarray(key_cache, dtype=np.float32) * k_scale
    vc = np.asarray(value_cache, dtype=np.float32) * v_scale
    bt = np.asarray(block_table)
    sl = np.asarray(seq_lens)

    outs = []
    for b in range(q.shape[0]):
        k = gather_cache_for_sequence(kc, bt[b], int(sl[b]))
        v = gather_cache_for_sequence(vc, bt[b], int(sl[b]))
        out = masked_attention(
            q[b : b + 1], k, v, scale, causal=False, softcap=softcap, window_size=window_size
        )
        outs.append(out[0])
    return np.stack(outs)


def varlen_attention(
    query: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    cu_seqlens_q: jax.Array,
    seq_lens: jax.Array,
    block_table: jax.Array,
    scale: float,
    causal: bool,
    softcap: float = 0.0,
    q_scale: float = 1.0,
    k_scale: float = 1.0,
    v_scale: float = 1.0,
    window_size: int = 0,
) -> np.ndarray:
    """Golden varlen attention over ragged queries."""
    q = np.asarray(query, dtype=np.float32) * q_scale
    kc = np.asarray(key_cache, dtype=np.float32) * k_scale
    vc = np.asarray(value_cache, dtype=np.float32) * v_scale
    cu = np.asarray(cu_seqlens_q)
    bt = np.asarray(block_table)
    sl = np.asarray(seq_lens)

    outs = []
    for b in range(cu.shape[0] - 1):
        qb = q[cu[b] : cu[b + 1]]
        k = gather_cache_for_sequence(kc, bt[b], int(sl[b]))
        v = gather_cache_for_sequence(vc, bt[b], int(sl[b]))
        outs.append(
            masked_attention(qb, k, v, scale, causal=causal, softcap=softcap, window_size=window_size)
        )
    return np.concatenate(outs, axis=0)
