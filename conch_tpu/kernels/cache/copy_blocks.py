# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Batched KV-cache page copies (vLLM ``copy_blocks`` equivalent).

TPU-native re-design of the reference Triton kernel
(``conch/kernels/vllm/copy_blocks.py:119-163``). The reference passes a
uint64 tensor of raw ``data_ptr()``s and casts them to typed pointers
in-kernel — impossible and unnecessary on TPU. Here each layer's cache is
a JAX array; the per-layer copy is one gather + one scatter
(``cache.at[dst].set(cache[src])``), jitted over the stacked layer
dimension so XLA emits a single fused copy kernel, with donation for
in-place semantics.

vLLM copy semantics: destination blocks are free blocks (no src/dst
aliasing within one call), so gather-then-scatter is exact.
"""

from __future__ import annotations

import jax


@jax.jit
def _copy_blocks_one(cache: jax.Array, block_mapping: jax.Array) -> jax.Array:
    src = block_mapping[:, 0]
    dst = block_mapping[:, 1]
    return cache.at[dst].set(cache[src])


def copy_blocks_launcher(
    key_caches: list[jax.Array],
    value_caches: list[jax.Array],
    block_mapping: jax.Array,
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Copy cache pages src -> dst in every layer's K and V cache.

    Args:
        key_caches/value_caches: per-layer caches, each
            (num_pages, page_size * num_kv_heads * head_size) or any
            page-major shape.
        block_mapping: (num_pairs, 2) [src, dst] page indices.

    Returns:
        Updated (key_caches, value_caches) lists.
    """
    new_keys = [_copy_blocks_one(kc, block_mapping) for kc in key_caches]
    new_values = [_copy_blocks_one(vc, block_mapping) for vc in value_caches]
    return new_keys, new_values
