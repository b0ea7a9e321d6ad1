# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Rotary embedding public op (parity: ``conch/ops/embedding/rotary_embedding.py:11-33``)."""

from __future__ import annotations

import jax

from conch_tpu.kernels.embedding.rotary_embedding import rotary_embedding_launcher


def rotary_embedding(
    positions: jax.Array,
    query: jax.Array,
    key: jax.Array,
    head_size: int,
    cos_sin_cache: jax.Array,
    *,
    is_neox: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Apply rotary positional embedding to query and key (NeoX style only).

    Args:
        positions: token positions, shape (num_tokens,).
        query: queries, shape (num_tokens, num_heads * head_size).
        key: keys, shape (num_tokens, num_kv_heads * head_size).
        head_size: attention head size.
        cos_sin_cache: precomputed [cos | sin] cache, shape (max_position, rot_dim).
        is_neox: must be True (NeoX-style split-half rotation), matching the
            reference kernel's restriction (``rotary_embedding.py:121,135``).

    Returns:
        Rotated (query, key).
    """
    if not is_neox:
        msg = "Only NeoX-style rotary embedding is supported"
        raise NotImplementedError(msg)
    return rotary_embedding_launcher(positions, query, key, head_size, cos_sin_cache)
