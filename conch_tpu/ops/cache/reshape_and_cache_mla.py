# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""MLA latent-cache token insertion (vLLM ``concat_and_cache_mla``
equivalent): one packed ``[c_kv | k_pe | pad]`` row per token into the
unified (num_pages, page_size, packed) cache."""

from __future__ import annotations

import jax

from conch_tpu.kernels.cache.reshape_and_cache import reshape_and_cache_mla_launcher


def reshape_and_cache_mla(
    kv: jax.Array,
    kv_cache: jax.Array,
    slot_mapping: jax.Array,
    scale: float | None = None,
) -> jax.Array:
    """Insert packed MLA rows; negative slots are dropped (padding).

    Args:
        kv: (num_tokens, packed) latent rows.
        kv_cache: (num_pages, page_size, packed); DONATED.
        slot_mapping: (num_tokens,) int32.
        scale: quantize-on-store scale for int8/fp8 caches
            (stored = round(x/scale), saturating); None stores as-is.

    Returns:
        The updated cache.
    """
    if kv.ndim != 2 or kv_cache.ndim != 3 or kv.shape[-1] != kv_cache.shape[-1]:
        msg = f"shape mismatch: kv {kv.shape} vs cache {kv_cache.shape}"
        raise ValueError(msg)
    if slot_mapping.shape[0] != kv.shape[0]:
        msg = f"slot_mapping covers {slot_mapping.shape[0]} tokens, kv has {kv.shape[0]}"
        raise ValueError(msg)
    return reshape_and_cache_mla_launcher(kv, kv_cache, slot_mapping, scale=scale)
