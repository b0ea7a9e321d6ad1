# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Token sampling: greedy, temperature, top-k, top-p (all per-request)."""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class SamplingParams:
    """Per-request sampling configuration."""

    temperature: float = 0.0  # 0 => greedy
    top_k: int = 0  # 0 => disabled
    top_p: float = 1.0
    # Parallel sampling: generate n independent completions per prompt.
    # The engine prefills the prompt once, then forks n sequences that
    # share the prompt's KV pages copy-on-read (only the partial tail
    # page is copied per fork). generate() returns a list of n outputs.
    n: int = 1
    max_tokens: int = 64
    min_tokens: int = 0  # eos/stop tokens are suppressed until this many
    stop_token_ids: tuple[int, ...] = ()  # finish on any of these (like eos)
    repetition_penalty: float = 1.0  # >1 discourages already-seen tokens
    logit_bias: tuple[tuple[int, float], ...] = ()  # (token, additive bias)
    logprobs: bool = False  # record each sampled token's log-probability
    # Guided (structured) decoding: a serving.guided.TokenFSM. Each step,
    # tokens the FSM disallows from the request's current state are masked
    # to -inf; EOS is legal only in accepting states (and forced once the
    # match cannot be extended). None => unconstrained.
    guided: object | None = None


@jax.jit
def _sample_tokens(
    logits: jax.Array,  # (batch, vocab) f32
    key: jax.Array,
    temperature: jax.Array,  # (batch,) 0 => greedy
    top_k: jax.Array,  # (batch,) int32, 0 => disabled
    top_p: jax.Array,  # (batch,)
) -> jax.Array:
    greedy = jnp.argmax(logits, axis=-1)

    scaled = logits / jnp.maximum(temperature, 1e-6)[:, None]
    # One descending sort serves both the per-row top-k threshold and the
    # top-p cumulative cutoff.
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]

    vocab = logits.shape[-1]
    k = jnp.where(top_k > 0, top_k, vocab).astype(jnp.int32)
    kth = jnp.take_along_axis(sorted_desc, jnp.clip(k - 1, 0, vocab - 1)[:, None], axis=-1)
    scaled = jnp.where(scaled < kth, -jnp.inf, scaled)
    sorted_desc = jnp.where(
        sorted_desc < kth, -jnp.inf, sorted_desc
    )  # keep the top-p pass consistent with the top-k filter

    probs = jax.nn.softmax(sorted_desc, axis=-1)
    cumprobs = jnp.cumsum(probs, axis=-1)
    # Keep the smallest prefix with cumulative prob >= top_p.
    cutoff_idx = jnp.sum(cumprobs < top_p[:, None], axis=-1)
    cutoff_val = jnp.take_along_axis(sorted_desc, cutoff_idx[:, None], axis=-1)
    scaled = jnp.where(scaled < cutoff_val, -jnp.inf, scaled)

    sampled = jax.random.categorical(key, scaled, axis=-1)
    return jnp.where(temperature <= 0.0, greedy, sampled).astype(jnp.int32)


def sample_tokens(
    logits: jax.Array,  # (batch, vocab) f32
    key: jax.Array,
    temperature: jax.Array,  # (batch,) 0 => greedy
    top_k: jax.Array | int = 0,
    top_p: jax.Array | None = None,
) -> jax.Array:
    """Sample next tokens; temperature 0 rows take the argmax.

    ``top_k``/``top_p`` are per-row arrays (scalars broadcast); 0 / 1.0
    disable the respective filter for that row.
    """
    batch = logits.shape[0]
    top_k_arr = jnp.broadcast_to(jnp.asarray(top_k, dtype=jnp.int32), (batch,))
    top_p_arr = (
        jnp.ones((batch,), dtype=jnp.float32)
        if top_p is None
        else jnp.broadcast_to(jnp.asarray(top_p, dtype=jnp.float32), (batch,))
    )
    return _sample_tokens(logits, key, temperature, top_k_arr, top_p_arr)
