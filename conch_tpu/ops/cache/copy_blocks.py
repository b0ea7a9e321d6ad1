# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""copy_blocks public op (parity: ``conch/ops/vllm/copy_blocks.py:71-87``).

Functional: returns updated per-layer cache lists.
"""

from __future__ import annotations

from typing import Final

import jax

from conch_tpu.kernels.cache.copy_blocks import copy_blocks_launcher


def _validate_sizes(
    key_caches: list[jax.Array],
    value_caches: list[jax.Array],
    block_mapping: jax.Array,
) -> None:
    num_layers: Final = len(key_caches)
    if len(value_caches) != num_layers:
        msg = f"Mismatch in number of layers between key_caches ({num_layers}) and value_caches ({len(value_caches)})"
        raise ValueError(msg)
    if num_layers == 0:
        msg = "Empty list of kv caches passed to copy_blocks"
        raise ValueError(msg)

    expected_shape: Final = key_caches[0].shape
    if any(kc.shape != expected_shape for kc in key_caches) or any(
        vc.shape != expected_shape for vc in value_caches
    ):
        msg = "Mismatch in shape of entries in key/value caches"
        raise ValueError(msg)

    expected_dtype: Final = key_caches[0].dtype
    if any(kc.dtype != expected_dtype for kc in key_caches) or any(
        vc.dtype != expected_dtype for vc in value_caches
    ):
        msg = "Mismatch in dtype of entries in key/value caches"
        raise ValueError(msg)

    if len(block_mapping.shape) != 2 or block_mapping.shape[1] != 2:
        msg = f"Block mapping tensor has invalid shape ({block_mapping.shape}), expected shape=(num_pairs, 2)"
        raise ValueError(msg)


def copy_blocks(
    key_caches: list[jax.Array],
    value_caches: list[jax.Array],
    block_mapping: jax.Array,
) -> tuple[list[jax.Array], list[jax.Array]]:
    """Copy cache pages src -> dst across all layers' K/V caches.

    Args:
        key_caches/value_caches: per-layer caches (any page-major shape).
        block_mapping: (num_pairs, 2) [src, dst] page index pairs.

    Returns:
        Updated (key_caches, value_caches).
    """
    _validate_sizes(key_caches, value_caches, block_mapping)
    return copy_blocks_launcher(key_caches, value_caches, block_mapping)
