# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for reshape_and_cache and copy_blocks.

Mirrors the reference's ``tests/reshape_and_cache_test.py`` /
``tests/copy_blocks_test.py``: slot scatter correctness, negative-slot
padding skip, fp8 quantize-on-store, multi-layer page copies.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.cache import copy_blocks, reshape_and_cache


def _make_cache(rng, num_pages, page_size, kv_heads, head, dtype=jnp.float32):
    # Canonical TPU cache layout: (num_pages, num_kv_heads, page_size, head).
    arr = rng.normal(size=(num_pages, kv_heads, page_size, head)).astype(np.float32)
    return jnp.asarray(arr, dtype=dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_reshape_and_cache_basic(dtype, rng):
    num_pages, page_size, kv_heads, head = 8, 16, 2, 64
    num_tokens = 10

    key_cache = _make_cache(rng, num_pages, page_size, kv_heads, head, dtype)
    value_cache = _make_cache(rng, num_pages, page_size, kv_heads, head, dtype)
    old_key_cache = np.asarray(key_cache, dtype=np.float32).copy()

    key = jnp.asarray(rng.normal(size=(num_tokens, kv_heads, head)), dtype=dtype)
    value = jnp.asarray(rng.normal(size=(num_tokens, kv_heads, head)), dtype=dtype)
    slots = rng.choice(num_pages * page_size, size=num_tokens, replace=False).astype(np.int32)

    new_key_cache, new_value_cache = reshape_and_cache(
        key, value, key_cache, value_cache, jnp.asarray(slots), strict=True
    )

    nk = np.asarray(new_key_cache, dtype=np.float32)
    nv = np.asarray(new_value_cache, dtype=np.float32)
    for t, slot in enumerate(slots):
        page, entry = slot // page_size, slot % page_size
        np.testing.assert_allclose(nk[page, :, entry], np.asarray(key, np.float32)[t], rtol=1e-6)
        np.testing.assert_allclose(nv[page, :, entry], np.asarray(value, np.float32)[t], rtol=1e-6)

    # Untouched slots keep their old contents.
    touched = {(s // page_size, s % page_size) for s in slots}
    for page in range(num_pages):
        for entry in range(page_size):
            if (page, entry) not in touched:
                np.testing.assert_allclose(nk[page, :, entry], old_key_cache[page, :, entry], rtol=1e-6)


def test_reshape_and_cache_negative_slots_skipped(rng):
    num_pages, page_size, kv_heads, head = 4, 8, 1, 32
    key_cache = _make_cache(rng, num_pages, page_size, kv_heads, head)
    value_cache = _make_cache(rng, num_pages, page_size, kv_heads, head)
    before = np.asarray(key_cache).copy()

    key = jnp.asarray(rng.normal(size=(3, kv_heads, head)), dtype=jnp.float32)
    value = jnp.asarray(rng.normal(size=(3, kv_heads, head)), dtype=jnp.float32)
    slots = jnp.asarray([5, -1, 12], dtype=jnp.int32)

    nk, nv = reshape_and_cache(key, value, key_cache, value_cache, slots)
    nk = np.asarray(nk)

    np.testing.assert_allclose(nk[5 // page_size, :, 5 % page_size], np.asarray(key)[0], rtol=1e-6)
    np.testing.assert_allclose(nk[12 // page_size, :, 12 % page_size], np.asarray(key)[2], rtol=1e-6)
    # The negative slot wrote nowhere: every other slot is unchanged.
    touched = {(5 // page_size, 5 % page_size), (12 // page_size, 12 % page_size)}
    for page in range(num_pages):
        for entry in range(page_size):
            if (page, entry) not in touched:
                np.testing.assert_allclose(nk[page, :, entry], before[page, :, entry], rtol=1e-6)


def test_reshape_and_cache_fp8(rng):
    num_pages, page_size, kv_heads, head = 4, 8, 2, 64
    key_cache = jnp.zeros((num_pages, kv_heads, page_size, head), dtype=jnp.float8_e4m3fn)
    value_cache = jnp.zeros((num_pages, kv_heads, page_size, head), dtype=jnp.float8_e4m3fn)

    key = jnp.asarray(rng.normal(size=(4, kv_heads, head)), dtype=jnp.bfloat16)
    value = jnp.asarray(rng.normal(size=(4, kv_heads, head)), dtype=jnp.bfloat16)
    slots = jnp.asarray([0, 9, 17, 31], dtype=jnp.int32)
    k_scale = jnp.asarray([0.5], dtype=jnp.float32)
    v_scale = jnp.asarray([2.0], dtype=jnp.float32)

    nk, nv = reshape_and_cache(
        key, value, key_cache, value_cache, slots,
        kv_cache_dtype="fp8", k_scale=k_scale, v_scale=v_scale,
    )
    assert nk.dtype == jnp.float8_e4m3fn

    # Stored value is x / scale (inverted-scale store), within fp8 precision.
    stored = np.asarray(nk, dtype=np.float32)[0, :, 0]
    expected = np.asarray(key, np.float32)[0] / 0.5
    np.testing.assert_allclose(stored, expected, rtol=0.15, atol=0.05)


def test_copy_blocks(rng):
    num_layers, num_pages, row = 3, 8, 16 * 2 * 64
    key_caches = [jnp.asarray(rng.normal(size=(num_pages, row)), dtype=jnp.float32) for _ in range(num_layers)]
    value_caches = [jnp.asarray(rng.normal(size=(num_pages, row)), dtype=jnp.float32) for _ in range(num_layers)]
    before_k = [np.asarray(c).copy() for c in key_caches]
    before_v = [np.asarray(c).copy() for c in value_caches]

    mapping = jnp.asarray([[0, 3], [5, 1], [6, 7]], dtype=jnp.int32)
    new_k, new_v = copy_blocks(key_caches, value_caches, mapping)

    for layer in range(num_layers):
        nk, nv = np.asarray(new_k[layer]), np.asarray(new_v[layer])
        for src, dst in [(0, 3), (5, 1), (6, 7)]:
            np.testing.assert_allclose(nk[dst], before_k[layer][src], rtol=1e-6)
            np.testing.assert_allclose(nv[dst], before_v[layer][src], rtol=1e-6)
        for untouched in (0, 2, 4, 5, 6):
            np.testing.assert_allclose(nk[untouched], before_k[layer][untouched], rtol=1e-6)


def test_copy_blocks_validation():
    with pytest.raises(ValueError, match="Empty list"):
        copy_blocks([], [], jnp.zeros((1, 2), dtype=jnp.int32))

    caches = [jnp.zeros((4, 8), dtype=jnp.float32)]
    with pytest.raises(ValueError, match="invalid shape"):
        copy_blocks(caches, caches, jnp.zeros((3,), dtype=jnp.int32))
