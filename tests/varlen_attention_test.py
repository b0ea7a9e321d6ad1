# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for varlen (prefill+decode) attention vs the golden reference.

Mirrors the reference's sweep (``tests/varlen_attention_test.py:17-36``):
causal x decode grids, GQA pairs, mixed prefill/decode batches,
non-power-of-two lengths, softcap, fp8 KV; tolerances fp16 7e-4 -> we use
fp32 2e-3 / bf16 2e-2 against the fp32 golden reference.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.attention import varlen_attention
from conch_tpu.reference.attention.attention import varlen_attention as varlen_ref
from conch_tpu.utils.test_utils import create_paged_fixture

# fp16 runs at the reference's own fp16 tolerance (/root/reference/tests/varlen_attention_test.py:27-36); the TPU
# launchers compute fp16 in f32 (Mosaic has no f16 compute), so
# fp16-in/fp16-out error is output rounding only.
TOLERANCES = {jnp.float32: 2e-3, jnp.float16: 2e-3, jnp.bfloat16: 2e-2}


def _run_and_compare(fx, dtype, causal, softcap=0.0, kv_cache_dtype="auto", k_scale=1.0, v_scale=1.0):
    import math

    head_size = fx.query.shape[-1]
    scale = 1.0 / math.sqrt(head_size)

    kwargs = {}
    if kv_cache_dtype != "auto":
        kwargs = {
            "kv_cache_dtype": kv_cache_dtype,
            "k_scale": jnp.asarray([k_scale], dtype=jnp.float32),
            "v_scale": jnp.asarray([v_scale], dtype=jnp.float32),
        }

    out = varlen_attention(
        fx.query,
        fx.key_cache,
        fx.value_cache,
        fx.cu_seqlens_q,
        fx.max_seqlen_q,
        fx.seq_lens,
        fx.max_seqlen_k,
        fx.block_table,
        causal=causal,
        scale=scale,
        softcap=softcap,
        strict=True,
        **kwargs,
    )
    expected = varlen_ref(
        fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.seq_lens, fx.block_table,
        scale, causal, softcap=softcap, k_scale=k_scale, v_scale=v_scale,
    )
    assert out.shape == fx.query.shape
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), expected, atol=TOLERANCES[dtype], rtol=TOLERANCES[dtype]
    )


@pytest.mark.parametrize("num_q_heads,num_kv_heads", [(8, 8), (32, 8), (4, 1)])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16, jnp.float16])
def test_varlen_prefill(num_q_heads, num_kv_heads, causal, dtype, rng):
    """Pure prefill: q_len == seq_len for every sequence."""
    seq_lens = [33, 128, 257]
    fx = create_paged_fixture(
        rng,
        batch=3,
        num_q_heads=num_q_heads,
        num_kv_heads=num_kv_heads,
        head_size=128,
        page_size=16,
        seq_lens=seq_lens,
        q_lens=seq_lens,
        dtype=dtype,
    )
    _run_and_compare(fx, dtype, causal)


@pytest.mark.parametrize("causal", [False, True])
def test_varlen_mixed_prefill_decode(causal, rng):
    """Mixed batch: some sequences prefill, some decode one token."""
    fx = create_paged_fixture(
        rng,
        batch=4,
        num_q_heads=8,
        num_kv_heads=2,
        head_size=64,
        page_size=16,
        seq_lens=[64, 100, 17, 256],
        q_lens=[64, 1, 17, 1],
        dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32, causal)


def test_varlen_pure_decode(rng):
    """All decodes (the reference's FlashDecoding regime)."""
    fx = create_paged_fixture(
        rng,
        batch=8,
        num_q_heads=16,
        num_kv_heads=4,
        head_size=128,
        page_size=32,
        seq_lens=[1025, 7, 512, 33, 2048, 100, 64, 343],
        q_lens=[1] * 8,
        dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32, causal=True)


def test_varlen_chunked_prefill(rng):
    """q_len < seq_len: continuation of a partially cached sequence."""
    fx = create_paged_fixture(
        rng,
        batch=2,
        num_q_heads=4,
        num_kv_heads=4,
        head_size=64,
        page_size=16,
        seq_lens=[128, 200],
        q_lens=[32, 50],
        dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32, causal=True)


def test_varlen_softcap(rng):
    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=4, num_kv_heads=1, head_size=64,
        page_size=16, seq_lens=[48, 64], q_lens=[48, 64], dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32, causal=True, softcap=50.0)


def test_varlen_fp8_kv(rng):
    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=8, num_kv_heads=2, head_size=128,
        page_size=16, seq_lens=[96, 40], q_lens=[96, 40], dtype=jnp.bfloat16,
        cache_dtype=jnp.float8_e4m3fn,
    )
    _run_and_compare(fx, jnp.bfloat16, causal=True, kv_cache_dtype="fp8", k_scale=1.25, v_scale=0.5)


def test_varlen_single_token_single_seq(rng):
    fx = create_paged_fixture(
        rng, batch=1, num_q_heads=2, num_kv_heads=2, head_size=64,
        page_size=16, seq_lens=[5], q_lens=[1], dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32, causal=True)


@pytest.mark.parametrize("head_size", [80, 96, 112, 192])
@pytest.mark.parametrize("causal", [False, True])
def test_varlen_odd_head_sizes(head_size, causal, rng):
    """Non-power-of-two head sizes (reference sweep
    ``tests/varlen_attention_test.py:17-24``)."""
    seq_lens = [33, 70]
    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=8, num_kv_heads=2, head_size=head_size,
        page_size=16, seq_lens=seq_lens, q_lens=[33, 9], dtype=jnp.float32,
    )
    _run_and_compare(fx, jnp.float32, causal)


@pytest.mark.parametrize("causal", [True, False])
def test_varlen_window_chunk_skip_allheads(rng, causal):
    """Sliding window over MANY KV chunks: chunks wholly before the window
    must be skipped (start_chunk > 0) without changing the result.

    head 128 -> all-heads DMA kernel; chunk_tokens=64 with seq 300 gives
    ~5 chunks so the skip/full/masked band split is real.
    """
    from conch_tpu.kernels.attention.varlen_attention import varlen_attention_launcher
    from conch_tpu.reference.attention.attention import varlen_attention as golden

    fx = create_paged_fixture(
        rng, batch=3, num_q_heads=4, num_kv_heads=2, head_size=128,
        page_size=16, seq_lens=[300, 190, 64], q_lens=[300, 64, 1], dtype=jnp.float32,
    )
    scale = 1 / math.sqrt(128)
    for window in (20, 100, 250):
        out = varlen_attention_launcher(
            fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.max_seqlen_q,
            fx.seq_lens, fx.block_table, scale=scale, causal=causal,
            window_size=window, chunk_tokens=64, q_chunk_rows=8,
        )
        exp = golden(
            fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.seq_lens,
            fx.block_table, scale, causal, window_size=window,
        )
        np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_varlen_window_chunk_skip_blockspec(rng, causal):
    """Same skip check on the BlockSpec fallback path (head 64: the index
    map clamps dead-page fetches on both the window and causal sides)."""
    from conch_tpu.reference.attention.attention import varlen_attention as golden

    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=4, num_kv_heads=2, head_size=64,
        page_size=16, seq_lens=[300, 190], q_lens=[48, 3], dtype=jnp.float32,
    )
    scale = 1 / math.sqrt(64)
    for window in (20, 100):
        out = varlen_attention(
            fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.max_seqlen_q,
            fx.seq_lens, fx.max_seqlen_q, fx.block_table, causal=causal, scale=scale,
            window_size=window,
        )
        exp = golden(
            fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.seq_lens,
            fx.block_table, scale, causal, window_size=window,
        )
        np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=2e-3, rtol=2e-3)


def test_varlen_window_chunk_skip_perhead(rng):
    """Force the per-kv-head DMA kernel (KH=4 x D=256 x page 1024 f32
    exceeds the all-heads VMEM budget) and check the window band split."""
    from conch_tpu.kernels.attention.varlen_attention import varlen_attention_launcher
    from conch_tpu.reference.attention.attention import varlen_attention as golden

    fx = create_paged_fixture(
        rng, batch=1, num_q_heads=4, num_kv_heads=4, head_size=256,
        page_size=1024, seq_lens=[2500], q_lens=[8], dtype=jnp.float32,
    )
    scale = 1 / math.sqrt(256)
    out = varlen_attention_launcher(
        fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.max_seqlen_q,
        fx.seq_lens, fx.block_table, scale=scale, causal=True,
        window_size=600, chunk_tokens=1024,
    )
    exp = golden(
        fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.seq_lens,
        fx.block_table, scale, True, window_size=600,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize("causal", [True, False])
def test_varlen_sliding_window(rng, causal):
    """Sliding window masks everything before the last W positions."""
    from conch_tpu.reference.attention.attention import varlen_attention as golden

    fx = create_paged_fixture(
        rng, batch=3, num_q_heads=4, num_kv_heads=2, head_size=64,
        page_size=16, seq_lens=[33, 64, 17], q_lens=[33, 20, 1], dtype=jnp.float32,
    )
    scale = 1 / math.sqrt(64)
    for window in (1, 7, 16, 1000):
        out = varlen_attention(
            fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.max_seqlen_q,
            fx.seq_lens, fx.max_seqlen_q, fx.block_table, causal=causal, scale=scale,
            window_size=window,
        )
        exp = golden(
            fx.query, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.seq_lens,
            fx.block_table, scale, causal, window_size=window,
        )
        np.testing.assert_allclose(np.asarray(out, np.float32), exp, atol=2e-3, rtol=2e-3)
