# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pinned once-broken configurations.

Mirrors the reference's practice of hardcoding configs that crashed or
produced wrong results at some point (``tests/varlen_attention_test.py:562-657``
pins a specific head/page/seq combination): each test here reproduces a
bug found while building conch_tpu, so the exact failing shape stays
covered forever.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.attention import paged_attention, varlen_attention
from conch_tpu.reference.attention.attention import paged_attention as paged_ref
from conch_tpu.reference.attention.attention import varlen_attention as varlen_ref
from conch_tpu.utils.test_utils import create_paged_fixture


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def test_pinned_seq_exactly_on_page_boundary(rng):
    """seq_len == k * page_size: the page-count ceil and the entry mask
    must agree (off-by-one here once double-counted the last page)."""
    fx = create_paged_fixture(
        rng, batch=3, num_q_heads=4, num_kv_heads=4, head_size=128,
        page_size=16, seq_lens=[16, 32, 64], dtype=jnp.float32,
    )
    out = paged_attention(
        fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens, scale=1 / math.sqrt(128)
    )
    expected = paged_ref(
        fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens, 1 / math.sqrt(128)
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=2e-3, rtol=2e-3)


def test_pinned_seq_len_one(rng):
    """A brand-new sequence (seq_len 1, single partially-filled page)."""
    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=8, num_kv_heads=2, head_size=128,
        page_size=32, seq_lens=[1, 1], dtype=jnp.float32,
    )
    out = paged_attention(
        fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens, scale=1 / math.sqrt(128)
    )
    expected = paged_ref(
        fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens, 1 / math.sqrt(128)
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=2e-3, rtol=2e-3)


def test_pinned_varlen_non_power_of_two_group(rng):
    """GQA group 3 (6 q-heads over 2 kv-heads): query chunk rows are not a
    multiple of the group, so chunk row -> query index arithmetic must
    handle groups straddling a chunk boundary."""
    seq_lens = [40, 23]
    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=6, num_kv_heads=2, head_size=64,
        page_size=16, seq_lens=seq_lens, q_lens=[40, 23], dtype=jnp.float32,
    )
    scale = 1 / math.sqrt(64)
    out = varlen_attention(
        fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.max_seqlen_q,
        fx.seq_lens, fx.max_seqlen_k, fx.block_table, causal=True, scale=scale,
    )
    expected = varlen_ref(
        fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.seq_lens,
        fx.block_table, scale, True,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=2e-3, rtol=2e-3)


def test_pinned_mixed_gemm_small_k_group_fallback():
    """K smaller than the preferred 256 tile with group_size == K/2: the
    tile-size fallback loop (bk -> group_size) once produced a
    Mosaic-illegal block shape."""
    from conch_tpu.models.linear import QuantizedLinear

    rng = np.random.default_rng(7)
    w = rng.normal(size=(96, 256)).astype(np.float32) * 0.05
    lin = QuantizedLinear.int4_from_dense(w, group_size=32)
    x = jnp.asarray(rng.normal(size=(4, 96)), jnp.float32)
    out = np.asarray(lin.apply(x))
    assert np.all(np.isfinite(out))
    # int4 groupwise quantization error bound, not exactness:
    ref = np.asarray(x) @ w
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.2


def test_pinned_int8_lm_head_group_larger_than_k():
    """group_size > K once crashed lm_head int8 quantization
    (fixed in round 1, commit 'fix lm_head group_size')."""
    from conch_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_layers=1, num_heads=2, num_kv_heads=1, head_dim=32, max_position=64,
    )
    params = init_llama_params(0, cfg, "int8", group_size=128)
    assert params["lm_head"] is not None
