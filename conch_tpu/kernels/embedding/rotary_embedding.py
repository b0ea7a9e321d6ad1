# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU kernel for NeoX-style rotary positional embedding.

Re-design of the reference Triton kernel
(``conch/kernels/embedding/rotary_embedding.py:114-172``). The reference
indexes a ``[cos | sin]`` split cache by position and rotates pairs
``(x1, x2) -> (x1*cos - x2*sin, x2*cos + x1*sin)`` where ``x1``/``x2`` are
the first/second halves of each head's rotary span (NeoX style,
reference ``:44-52, :77-84``).

TPU design: the per-token cos/sin rows are gathered from the cache by XLA
(one fused gather, no in-kernel pointer chasing), then a single Pallas
kernel applies the rotation to Q and K blocks. The rotation is expressed as

    out = x * [cos|cos] + swap_neg(x) * [sin|sin],  swap_neg(x) = [-x2|x1]

which is two VPU multiplies and one concat — no per-pair scalar indexing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import cdiv, compute_dtype, pick_block_rows, use_interpret_mode


def _rope_kernel(q_ref, k_ref, cos_ref, sin_ref, q_out_ref, k_out_ref, *, num_q_heads: int, num_k_heads: int, rot_dim: int, head_size: int):
    cos = cos_ref[...]  # (block_tokens, rot_dim/2), fp32
    sin = sin_ref[...]
    cos_cat = jnp.concatenate([cos, cos], axis=-1)[:, None, :]  # (bt, 1, rot_dim)
    sin_cat = jnp.concatenate([sin, sin], axis=-1)[:, None, :]

    def rotate(x_ref, out_ref, num_heads):
        block_tokens = x_ref.shape[0]
        x = x_ref[...].reshape(block_tokens, num_heads, head_size)
        xr = x[..., :rot_dim].astype(jnp.float32)
        half = rot_dim // 2
        x1, x2 = xr[..., :half], xr[..., half:]
        swapped = jnp.concatenate([-x2, x1], axis=-1)
        rotated = (xr * cos_cat + swapped * sin_cat).astype(out_ref.dtype)
        if rot_dim < head_size:
            rotated = jnp.concatenate([rotated, x[..., rot_dim:]], axis=-1)
        out_ref[...] = rotated.reshape(block_tokens, num_heads * head_size)

    rotate(q_ref, q_out_ref, num_q_heads)
    rotate(k_ref, k_out_ref, num_k_heads)


@functools.partial(jax.jit, static_argnames=("head_size",))
def rotary_embedding_launcher(
    positions: jax.Array,
    query: jax.Array,
    key: jax.Array,
    head_size: int,
    cos_sin_cache: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Apply NeoX rotary embedding to Q and K.

    Args:
        positions: (num_tokens,) int32 token positions.
        query: (num_tokens, num_q_heads * head_size).
        key: (num_tokens, num_k_heads * head_size).
        head_size: size of each attention head.
        cos_sin_cache: (max_position, rot_dim) split as [cos | sin].

    Returns:
        Rotated (query, key).
    """
    num_tokens = query.shape[0]
    orig_dtype = query.dtype
    io_dtype = compute_dtype(orig_dtype)
    query = query.astype(io_dtype)
    key = key.astype(io_dtype)
    num_q_heads = query.shape[-1] // head_size
    num_k_heads = key.shape[-1] // head_size
    rot_dim = cos_sin_cache.shape[-1]
    half = rot_dim // 2

    # XLA gather of the per-token cos/sin rows (fuses into one HBM sweep).
    cos_sin = jnp.take(cos_sin_cache, positions, axis=0).astype(jnp.float32)
    cos, sin = cos_sin[:, :half], cos_sin[:, half:]

    itemsize = jnp.dtype(io_dtype).itemsize
    bytes_per_token = 2 * (query.shape[-1] + key.shape[-1]) * itemsize + rot_dim * 4
    block_tokens = pick_block_rows(num_tokens, bytes_per_token)
    grid = (cdiv(num_tokens, block_tokens),)

    def tok_spec(width):
        return pl.BlockSpec((block_tokens, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    q_out, k_out = pl.pallas_call(
        functools.partial(
            _rope_kernel,
            num_q_heads=num_q_heads,
            num_k_heads=num_k_heads,
            rot_dim=rot_dim,
            head_size=head_size,
        ),
        out_shape=(
            jax.ShapeDtypeStruct(query.shape, query.dtype),
            jax.ShapeDtypeStruct(key.shape, key.dtype),
        ),
        grid=grid,
        in_specs=[
            tok_spec(query.shape[-1]),
            tok_spec(key.shape[-1]),
            tok_spec(half),
            tok_spec(half),
        ],
        out_specs=(tok_spec(query.shape[-1]), tok_spec(key.shape[-1])),
        interpret=use_interpret_mode(),
    )(query, key, cos, sin)

    return q_out.astype(orig_dtype), k_out.astype(orig_dtype)
