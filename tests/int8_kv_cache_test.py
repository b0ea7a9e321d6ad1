# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for the int8 KV-cache path (north-star config: int8 KV serving)."""

import math

import jax.numpy as jnp
import numpy as np

from conch_tpu.ops.attention import paged_attention
from conch_tpu.ops.cache import reshape_and_cache
from conch_tpu.reference.attention.attention import paged_attention as paged_ref
from conch_tpu.utils.test_utils import create_paged_fixture


def test_reshape_and_cache_int8_store(rng):
    num_pages, page_size, kv_heads, head = 4, 8, 2, 64
    key_cache = jnp.zeros((num_pages, kv_heads, page_size, head), dtype=jnp.int8)
    value_cache = jnp.zeros((num_pages, kv_heads, page_size, head), dtype=jnp.int8)

    key = jnp.asarray(rng.normal(size=(4, kv_heads, head)), dtype=jnp.bfloat16)
    value = jnp.asarray(rng.normal(size=(4, kv_heads, head)), dtype=jnp.bfloat16)
    slots = jnp.asarray([0, 5, 9, 17], dtype=jnp.int32)
    k_scale = jnp.asarray([0.05], dtype=jnp.float32)  # ~[-6, 6] range coverage
    v_scale = jnp.asarray([0.05], dtype=jnp.float32)

    nk, nv = reshape_and_cache(
        key, value, key_cache, value_cache, slots,
        kv_cache_dtype="int8", k_scale=k_scale, v_scale=v_scale,
    )
    assert nk.dtype == jnp.int8
    # Stored = round(x / scale), clamped; dequant recovers within scale/2.
    stored = np.asarray(nk, dtype=np.float32)[0, :, 0] * 0.05
    np.testing.assert_allclose(stored, np.asarray(key, np.float32)[0], atol=0.03)


def test_paged_attention_int8_kv(rng):
    fx = create_paged_fixture(
        rng, batch=2, num_q_heads=8, num_kv_heads=2, head_size=128,
        page_size=16, seq_lens=[96, 200], dtype=jnp.bfloat16,
    )
    # Quantize the fixture's caches to int8 with a known scale.
    scale = 0.05
    k_int8 = jnp.clip(jnp.round(fx.key_cache.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)
    v_int8 = jnp.clip(jnp.round(fx.value_cache.astype(jnp.float32) / scale), -128, 127).astype(jnp.int8)

    sm_scale = 1.0 / math.sqrt(128)
    out = paged_attention(
        fx.query, k_int8, v_int8, fx.block_table, fx.seq_lens,
        scale=sm_scale, kv_cache_dtype="int8",
        k_scale=jnp.asarray([scale], jnp.float32), v_scale=jnp.asarray([scale], jnp.float32),
    )
    expected = paged_ref(
        fx.query, k_int8, v_int8, fx.block_table, fx.seq_lens,
        sm_scale, k_scale=scale, v_scale=scale,
    )
    np.testing.assert_allclose(np.asarray(out, np.float32), expected, atol=3e-2, rtol=3e-2)


def test_fp8_bit_algebra_cast_exhaustive():
    """cast_kv's e4m3->bf16 bit algebra is exact for every finite encoding
    (the kernels' fp8 dequant fast path; v5e has no native fp8)."""
    import jax
    import numpy as np

    from conch_tpu.kernels.common import cast_kv

    bits = np.arange(256, dtype=np.uint8)
    x = jax.lax.bitcast_convert_type(jnp.asarray(bits), jnp.float8_e4m3fn)
    got = np.asarray(cast_kv(x, jnp.bfloat16), np.float32)
    want = np.asarray(x.astype(jnp.float32))
    finite = ~np.isnan(want)
    np.testing.assert_array_equal(got[finite], want[finite])
