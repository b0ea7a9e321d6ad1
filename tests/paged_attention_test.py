# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for decode paged attention vs the golden reference.

Mirrors the reference's sweep (``tests/paged_attention_test.py:20-48``):
head sizes, MHA/GQA/MQA head pairs, non-power-of-two sequence lengths,
dtypes, softcap, fp8 KV cache; tolerances fp32 2e-3 / fp16 5e-3 / bf16 3e-2.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.attention import paged_attention
from conch_tpu.reference.attention.attention import paged_attention as paged_ref
from conch_tpu.utils.test_utils import create_paged_fixture

TOLERANCES = {jnp.float32: 2e-3, jnp.float16: 5e-3, jnp.bfloat16: 3e-2}


def _run_and_compare(fx, dtype, softcap=0.0, scale=None, k_scale=1.0, v_scale=1.0, kv_cache_dtype="auto"):
    import math

    head_size = fx.query.shape[-1]
    scale = scale or 1.0 / math.sqrt(head_size)

    kwargs = {}
    if kv_cache_dtype != "auto":
        kwargs = {
            "kv_cache_dtype": kv_cache_dtype,
            "k_scale": jnp.asarray([k_scale], dtype=jnp.float32),
            "v_scale": jnp.asarray([v_scale], dtype=jnp.float32),
        }
    out = paged_attention(
        fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens,
        scale=scale, softcap=softcap, **kwargs
    )
    expected = paged_ref(
        fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens,
        scale, softcap=softcap, k_scale=k_scale, v_scale=v_scale
    )
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), expected, atol=TOLERANCES[dtype], rtol=TOLERANCES[dtype]
    )


@pytest.mark.parametrize("num_q_heads,num_kv_heads", [(8, 8), (32, 8), (4, 1)])
@pytest.mark.parametrize("head_size", [64, 128, 256])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float16])
def test_paged_attention_heads_dtypes(num_q_heads, num_kv_heads, head_size, dtype, rng):
    fx = create_paged_fixture(
        rng,
        batch=4,
        num_q_heads=num_q_heads,
        num_kv_heads=num_kv_heads,
        head_size=head_size,
        page_size=16,
        seq_lens=[1, 17, 128, 257],
        dtype=dtype,
    )
    _run_and_compare(fx, dtype)


@pytest.mark.parametrize("seq_lens", [[343], [1025, 7, 1024, 33]])
@pytest.mark.parametrize("page_size", [16, 32])
def test_paged_attention_nonpow2_seqs(seq_lens, page_size, rng):
    fx = create_paged_fixture(
        rng,
        batch=len(seq_lens),
        num_q_heads=8,
        num_kv_heads=2,
        head_size=128,
        page_size=page_size,
        seq_lens=seq_lens,
        dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32)


def test_paged_attention_softcap(rng):
    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=4, num_kv_heads=4, head_size=64,
        page_size=16, seq_lens=[64, 100], dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32, softcap=30.0)


def test_paged_attention_fp8_kv_cache(rng):
    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=8, num_kv_heads=2, head_size=128,
        page_size=16, seq_lens=[96, 200], dtype=jnp.bfloat16,
        cache_dtype=jnp.float8_e4m3fn,
    )
    # fp8 cache values dequantize via the scales; compare against the
    # reference computed on the *quantized* values (same information).
    _run_and_compare(fx, jnp.bfloat16, k_scale=1.5, v_scale=0.75, kv_cache_dtype="fp8")


def test_paged_attention_single_page(rng):
    fx = create_paged_fixture(
        rng, batch=1, num_q_heads=2, num_kv_heads=2, head_size=64,
        page_size=32, seq_lens=[5], dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32)


@pytest.mark.parametrize("head_size", [80, 96, 112, 192])
def test_paged_attention_odd_head_sizes(head_size, rng):
    """Non-power-of-two head sizes (reference sweep
    ``tests/varlen_attention_test.py:17-24``): lane dims that are not a
    multiple of 128 route through the BlockSpec-pipelined varlen path."""
    fx = create_paged_fixture(
        rng, batch=3, num_q_heads=8, num_kv_heads=2, head_size=head_size,
        page_size=16, seq_lens=[5, 64, 130], dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32)


@pytest.mark.parametrize("head_size", [96, 192])
def test_paged_attention_odd_head_sizes_softcap_gqa(head_size, rng):
    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=4, num_kv_heads=1, head_size=head_size,
        page_size=16, seq_lens=[33, 17], dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32, softcap=30.0)


def test_paged_sliding_window(rng):
    from conch_tpu.reference.attention.attention import paged_attention as golden

    for head_size, window in [(128, 3), (128, 16), (64, 9), (96, 100)]:
        fx = create_paged_fixture(
            rng, batch=4, num_q_heads=8, num_kv_heads=2, head_size=head_size,
            page_size=16, seq_lens=[1, 17, 64, 33], dtype=jnp.float32,
        )
        scale = 1 / math.sqrt(head_size)
        out = paged_attention(
            fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens,
            scale=scale, window_size=window,
        )
        exp = golden(
            fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens,
            scale, window_size=window,
        )
        np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=2e-3, rtol=2e-3)
