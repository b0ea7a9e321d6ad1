# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pure-jnp golden reference for rotary embedding.

Mirrors ``conch/reference/embedding/rotary_embedding.py:12-90`` including
the cos/sin cache builder used by tests and models.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def compute_cos_sin_cache(
    base: float,
    rotary_dim: int,
    max_position_embeddings: int,
    rope_scaling: dict | None = None,
) -> jax.Array:
    """Build the [cos | sin] cache, shape (max_position, rotary_dim).

    ``rope_scaling`` supports the HF "llama3" scheme (Llama-3.1+
    checkpoints): frequencies below the low-frequency threshold stretch
    by ``factor``, above the high-frequency threshold stay, and the band
    between interpolates smoothly — matching
    ``transformers.modeling_rope_utils._compute_llama3_parameters``.
    """
    inv_freq = 1.0 / (base ** (np.arange(0, rotary_dim, 2, dtype=np.float32) / rotary_dim))
    if rope_scaling is not None:
        if rope_scaling.get("rope_type", rope_scaling.get("type")) != "llama3":
            msg = f"unsupported rope_scaling: {rope_scaling}"
            raise ValueError(msg)
        factor = rope_scaling["factor"]
        low = rope_scaling.get("low_freq_factor", 1.0)
        high = rope_scaling.get("high_freq_factor", 4.0)
        old_ctx = rope_scaling.get("original_max_position_embeddings", 8192)
        wavelen = 2 * np.pi / inv_freq
        low_wavelen = old_ctx / low
        high_wavelen = old_ctx / high
        scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (old_ctx / wavelen - low) / (high - low)
        mid = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        in_band = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        inv_freq = np.where(in_band, mid, scaled).astype(np.float32)
    t = np.arange(max_position_embeddings, dtype=np.float32)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    return jnp.asarray(np.concatenate([np.cos(freqs), np.sin(freqs)], axis=-1))


def _apply_rotary_emb(x: jax.Array, cos: jax.Array, sin: jax.Array, *, is_neox_style: bool = True) -> jax.Array:
    """Rotate pairs within each head.

    Args:
        x: (num_tokens, num_heads, rot_dim).
        cos/sin: (num_tokens, rot_dim // 2).
    """
    cos = cos[:, None, :].astype(x.dtype)
    sin = sin[:, None, :].astype(x.dtype)
    if is_neox_style:
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
    else:
        x1, x2 = x[..., ::2], x[..., 1::2]
    o1 = x1 * cos - x2 * sin
    o2 = x2 * cos + x1 * sin
    if is_neox_style:
        return jnp.concatenate([o1, o2], axis=-1)
    return jnp.stack([o1, o2], axis=-1).reshape(x.shape)


def rotary_embedding(
    positions: jax.Array,
    query: jax.Array,
    key: jax.Array,
    cos_sin_cache: jax.Array,
    rotary_dim: int,
    head_size: int,
    *,
    is_neox_style: bool = True,
    offsets: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Golden rotary embedding reference."""
    if offsets is not None:
        positions = positions + offsets
    positions = positions.reshape(-1)
    num_tokens = positions.shape[0]
    cos_sin = jnp.take(cos_sin_cache, positions, axis=0)
    half = cos_sin.shape[-1] // 2
    cos, sin = cos_sin[:, :half], cos_sin[:, half:]

    def rotate(x):
        shape = x.shape
        x = x.reshape(num_tokens, -1, head_size)
        x_rot = _apply_rotary_emb(x[..., :rotary_dim], cos, sin, is_neox_style=is_neox_style)
        return jnp.concatenate([x_rot, x[..., rotary_dim:]], axis=-1).reshape(shape)

    return rotate(query), rotate(key)
