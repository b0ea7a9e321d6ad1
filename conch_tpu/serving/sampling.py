# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Token sampling: greedy, temperature, top-k, top-p."""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration."""

    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0
    max_tokens: int = 64


@functools.partial(jax.jit, static_argnames=("top_k",))
def sample_tokens(
    logits: jax.Array,  # (batch, vocab) f32
    key: jax.Array,
    temperature: jax.Array,  # (batch,) 0 => greedy
    top_k: int = 0,
    top_p: jax.Array | None = None,  # (batch,)
) -> jax.Array:
    """Sample next tokens; temperature 0 rows take the argmax."""
    greedy = jnp.argmax(logits, axis=-1)

    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]

    if top_k > 0:
        kth = jnp.sort(scaled, axis=-1)[:, -top_k][:, None]
        scaled = jnp.where(scaled < kth, -jnp.inf, scaled)

    if top_p is not None:
        sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        cumprobs = jnp.cumsum(probs, axis=-1)
        # Keep the smallest prefix with cumulative prob >= top_p.
        cutoff_idx = jnp.sum(cumprobs < top_p[:, None], axis=-1)
        cutoff_val = jnp.take_along_axis(sorted_logits, cutoff_idx[:, None], axis=-1)
        scaled = jnp.where(scaled < cutoff_val, -jnp.inf, scaled)

    sampled = jax.random.categorical(key, scaled, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled).astype(jnp.int32)
