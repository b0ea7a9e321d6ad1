# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Randomized paged-KV-cache fixtures for tests and benchmarks.

From-scratch equivalent of the vendored vLLM test helpers
(``conch/third_party/vllm/utils.py:28-175``): builds paged caches with
random physical page assignment so tests exercise real block-table
indirection.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np


@dataclass
class PagedAttentionFixture:
    query: jnp.ndarray
    key_cache: jnp.ndarray
    value_cache: jnp.ndarray
    block_table: jnp.ndarray
    seq_lens: jnp.ndarray
    cu_seqlens_q: jnp.ndarray
    max_seqlen_q: int
    max_seqlen_k: int


def create_paged_fixture(
    rng: np.random.Generator,
    *,
    batch: int,
    num_q_heads: int,
    num_kv_heads: int,
    head_size: int,
    page_size: int,
    seq_lens: list[int],
    q_lens: list[int] | None = None,
    dtype=jnp.float32,
    cache_dtype=None,
) -> PagedAttentionFixture:
    """Build a randomized paged KV cache + block table fixture.

    ``q_lens`` of None means decode (one query per sequence). Physical
    pages are assigned by random permutation so block tables are
    non-trivial.
    """
    assert len(seq_lens) == batch
    cache_dtype = cache_dtype or dtype
    q_lens = q_lens or [1] * batch

    max_seq = max(seq_lens)
    pages_per_seq = -(-max_seq // page_size)
    total_pages = batch * pages_per_seq + 8

    perm = rng.permutation(total_pages)
    block_table = np.zeros((batch, pages_per_seq), dtype=np.int32)
    for b in range(batch):
        block_table[b] = perm[b * pages_per_seq : (b + 1) * pages_per_seq]

    key_cache = rng.normal(size=(total_pages, num_kv_heads, page_size, head_size)).astype(np.float32)
    value_cache = rng.normal(size=(total_pages, num_kv_heads, page_size, head_size)).astype(np.float32)

    total_q = sum(q_lens)
    query = rng.normal(size=(total_q, num_q_heads, head_size)).astype(np.float32)
    cu = np.concatenate([[0], np.cumsum(q_lens)]).astype(np.int32)

    return PagedAttentionFixture(
        query=jnp.asarray(query, dtype=dtype),
        key_cache=jnp.asarray(key_cache, dtype=cache_dtype),
        value_cache=jnp.asarray(value_cache, dtype=cache_dtype),
        block_table=jnp.asarray(block_table),
        seq_lens=jnp.asarray(np.asarray(seq_lens, dtype=np.int32)),
        cu_seqlens_q=jnp.asarray(cu),
        max_seqlen_q=max(q_lens),
        max_seqlen_k=max_seq,
    )
