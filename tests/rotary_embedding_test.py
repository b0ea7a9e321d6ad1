# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for rotary embedding vs the golden jnp reference.

Mirrors the reference's rope test sweep: head sizes, GQA head counts,
partial rotary dims.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.embedding import rotary_embedding
from conch_tpu.reference.embedding.rotary_embedding import (
    compute_cos_sin_cache,
    rotary_embedding as rotary_embedding_ref,
)

DTYPES = [jnp.float32, jnp.bfloat16]
TOLERANCES = {jnp.float32: 1e-5, jnp.float16: 1e-3, jnp.bfloat16: 2e-2}


@pytest.mark.parametrize("num_tokens", [1, 7, 256])
@pytest.mark.parametrize("num_q_heads,num_k_heads", [(8, 8), (32, 8), (4, 1)])
@pytest.mark.parametrize("head_size", [64, 128, 256])
@pytest.mark.parametrize("dtype", DTYPES)
def test_rotary_embedding(num_tokens, num_q_heads, num_k_heads, head_size, dtype, rng):
    max_pos = 1024
    cache = compute_cos_sin_cache(10000.0, head_size, max_pos)
    positions = jnp.asarray(rng.integers(0, max_pos, size=(num_tokens,)), dtype=jnp.int32)
    q = jnp.asarray(rng.normal(size=(num_tokens, num_q_heads * head_size)), dtype=dtype)
    k = jnp.asarray(rng.normal(size=(num_tokens, num_k_heads * head_size)), dtype=dtype)

    q_out, k_out = rotary_embedding(positions, q, k, head_size, cache)
    q_exp, k_exp = rotary_embedding_ref(positions, q, k, cache, head_size, head_size)

    tol = TOLERANCES[dtype]
    np.testing.assert_allclose(
        np.asarray(q_out, dtype=np.float32), np.asarray(q_exp, dtype=np.float32), atol=tol, rtol=tol
    )
    np.testing.assert_allclose(
        np.asarray(k_out, dtype=np.float32), np.asarray(k_exp, dtype=np.float32), atol=tol, rtol=tol
    )


def test_rotary_embedding_partial_rotdim(rng):
    """rot_dim < head_size leaves the tail of each head untouched."""
    head_size, rot_dim, num_tokens = 128, 64, 16
    cache = compute_cos_sin_cache(10000.0, rot_dim, 512)
    positions = jnp.asarray(rng.integers(0, 512, size=(num_tokens,)), dtype=jnp.int32)
    q = jnp.asarray(rng.normal(size=(num_tokens, 4 * head_size)), dtype=jnp.float32)
    k = jnp.asarray(rng.normal(size=(num_tokens, 2 * head_size)), dtype=jnp.float32)

    q_out, k_out = rotary_embedding(positions, q, k, head_size, cache)
    q_exp, k_exp = rotary_embedding_ref(positions, q, k, cache, rot_dim, head_size)

    np.testing.assert_allclose(np.asarray(q_out), np.asarray(q_exp), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(k_out), np.asarray(k_exp), atol=1e-5, rtol=1e-5)
