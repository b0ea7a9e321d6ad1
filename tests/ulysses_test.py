# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Ulysses (all-to-all) sequence parallelism vs dense attention oracle."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from conch_tpu.parallel.ring_attention import dense_attention_reference
from conch_tpu.parallel.ulysses import make_ulysses_attention


@pytest.fixture(scope="module")
def seq_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("seq",))


@pytest.mark.parametrize("causal", [True, False])
def test_ulysses_matches_dense(seq_mesh, causal):
    nrng = np.random.default_rng(3)
    b, s, h, d = 2, 64, 8, 32
    q = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    scale = 1 / math.sqrt(d)

    out = make_ulysses_attention(seq_mesh, scale=scale, causal=causal)(q, k, v)
    exp = dense_attention_reference(q, k, v, scale=scale, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=2e-5, rtol=2e-5)


def test_ulysses_gqa(seq_mesh):
    """GQA: 16 query heads over 8 chips, 8 KV heads (group of 2)."""
    nrng = np.random.default_rng(4)
    b, s, hq, hkv, d = 1, 64, 16, 8, 16
    q = jnp.asarray(nrng.normal(size=(b, s, hq, d)), jnp.float32)
    k = jnp.asarray(nrng.normal(size=(b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(nrng.normal(size=(b, s, hkv, d)), jnp.float32)
    scale = 1 / math.sqrt(d)

    out = make_ulysses_attention(seq_mesh, scale=scale, causal=True)(q, k, v)
    # Oracle: repeat KV heads to the query head count.
    group = hq // hkv
    k_rep = jnp.repeat(k, group, axis=2)
    v_rep = jnp.repeat(v, group, axis=2)
    exp = dense_attention_reference(q, k_rep, v_rep, scale=scale, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=2e-5, rtol=2e-5)


def test_ulysses_bf16(seq_mesh):
    nrng = np.random.default_rng(5)
    b, s, h, d = 1, 128, 8, 32
    q = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.bfloat16)
    scale = 1 / math.sqrt(d)

    out = make_ulysses_attention(seq_mesh, scale=scale, causal=True)(q, k, v)
    exp = dense_attention_reference(q, k, v, scale=scale, causal=True)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(exp, np.float32), atol=2e-2, rtol=2e-2
    )


def test_ulysses_rejects_indivisible_heads(seq_mesh):
    q = jnp.zeros((1, 64, 6, 16), jnp.float32)
    with pytest.raises(ValueError, match="divisible"):
        make_ulysses_attention(seq_mesh, scale=1.0)(q, q, q)
