# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for bitsandbytes-style blockwise quantization.

Mirrors the reference's test strategy (``tests/quantize_blockwise_test.py``):
scalar micro-tests for every NF4/FP4 boundary value, random-tensor
round-trips per blocksize/dtype, packed-byte comparison with atol=1
(codes at exact midpoints may round either way), and double quantization.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.kernels.quantization.bitsandbytes.blockwise import (
    NF4_CODE,
    NF4_THRESHOLDS,
    _fp4_decode,
    _fp4_encode,
    _nf4_decode,
    _nf4_encode,
)
from conch_tpu.ops.quantization.bitsandbytes.functional import (
    create_dynamic_map,
    dequantize_4bit,
    dequantize_blockwise,
    quantize_4bit,
    quantize_blockwise,
)
from conch_tpu.reference.quantization.bitsandbytes import blockwise as ref

BLOCKSIZES = [64, 256, 1024]
DTYPES = [jnp.float32, jnp.bfloat16, jnp.float16]


def test_nf4_boundary_values():
    """Every NF4 code value must encode back to itself (scalar micro-test)."""
    for code_val in range(16):
        value = float(NF4_CODE[code_val])
        encoded = int(_nf4_encode(jnp.asarray([value]))[0])
        assert encoded == code_val, f"NF4 code {code_val} -> {encoded}"
        decoded = float(_nf4_decode(jnp.asarray([code_val]))[0])
        np.testing.assert_allclose(decoded, value, rtol=1e-6)


def test_nf4_threshold_edges():
    """Just above each threshold must map to the upper code."""
    eps = 1e-5
    for i, t in enumerate(NF4_THRESHOLDS):
        above = int(_nf4_encode(jnp.asarray([t + eps]))[0])
        below = int(_nf4_encode(jnp.asarray([t - eps]))[0])
        assert above == i + 1
        assert below == i


def test_fp4_roundtrip_all_codes():
    """Every FP4 code decodes and re-encodes to itself (except -0 == +0)."""
    for code_val in range(16):
        value = float(_fp4_decode(jnp.asarray([code_val]))[0])
        re_encoded = int(_fp4_encode(jnp.asarray([value]))[0])
        if code_val == 8:  # -0.0 encodes as +0
            assert re_encoded in (0, 8)
        else:
            assert re_encoded == code_val


@pytest.mark.parametrize("blocksize", BLOCKSIZES)
@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
@pytest.mark.parametrize("dtype", DTYPES)
def test_quantize_blockwise_vs_reference(blocksize, quant_type, dtype, rng):
    n = 4096
    x = jnp.asarray(rng.normal(size=(n,)), dtype=dtype)

    packed, state = quantize_blockwise(x, blocksize=blocksize, quant_type=quant_type)
    expected_packed, expected_absmax = ref.quantize_blockwise(
        np.asarray(x, dtype=np.float32), blocksize, quant_type
    )

    assert packed.shape == expected_packed.shape
    np.testing.assert_allclose(np.asarray(state.absmax), expected_absmax, rtol=1e-6)
    # Byte-level comparison with atol=1 per nibble: codes at exact midpoints
    # may round either way across implementations (reference test tolerance).
    ours = np.asarray(packed, dtype=np.int32).reshape(-1)
    theirs = expected_packed.astype(np.int32).reshape(-1)
    assert np.all(np.abs((ours >> 4) - (theirs >> 4)) <= 1)
    assert np.all(np.abs((ours & 15) - (theirs & 15)) <= 1)


@pytest.mark.parametrize("blocksize", BLOCKSIZES)
@pytest.mark.parametrize("quant_type", ["nf4", "fp4"])
def test_dequantize_blockwise_roundtrip(blocksize, quant_type, rng):
    n = 8192
    x = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)

    packed, state = quantize_blockwise(x, blocksize=blocksize, quant_type=quant_type)
    restored = dequantize_blockwise(packed, quant_state=state)

    assert restored.shape == (n,)
    assert restored.dtype == x.dtype
    # Max quantization error for a [-1,1]-normalized codebook is bounded by
    # the largest code gap times the block absmax.
    per_block_bound = np.repeat(np.asarray(state.absmax), blocksize)[:n]
    err = np.abs(np.asarray(restored) - np.asarray(x))
    gap = 0.16 if quant_type == "nf4" else 0.5
    assert np.all(err <= gap * per_block_bound + 1e-6)


def test_dequantize_matches_reference(rng):
    n = 2048
    x = np.asarray(rng.normal(size=(n,)), dtype=np.float32)
    packed, state = quantize_blockwise(jnp.asarray(x), blocksize=64, quant_type="nf4")

    ours = np.asarray(dequantize_blockwise(packed, quant_state=state))
    theirs = ref.dequantize_blockwise(np.asarray(packed), np.asarray(state.absmax), 64, n, "nf4")
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


def test_dynamic_8bit_roundtrip(rng):
    code = create_dynamic_map()
    n = 4096
    x = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)

    packed, state = quantize_blockwise(x, code=code, blocksize=256, quant_type="fp8")
    assert packed.shape == (n,)
    assert packed.dtype == jnp.uint8

    restored = dequantize_blockwise(packed, quant_state=state)
    # Dynamic 8-bit has ~2-3 significant digits; compare loosely.
    np.testing.assert_allclose(np.asarray(restored), np.asarray(x), atol=0.1, rtol=0.1)


def test_quantize_4bit_double_quantization(rng):
    n = 64 * 512
    x = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)

    packed, state = quantize_4bit(x, blocksize=64, quant_type="nf4", compress_statistics=True)
    assert state.nested
    assert state.state2 is not None
    assert state.offset is not None

    restored = dequantize_4bit(packed, quant_state=state)
    assert restored.shape == (n,)

    # Compare against the non-nested path: double quantization adds only
    # small absmax error.
    packed2, state_flat = quantize_4bit(x, blocksize=64, quant_type="nf4", compress_statistics=False)
    restored_flat = dequantize_4bit(packed2, quant_state=state_flat)
    np.testing.assert_allclose(np.asarray(restored), np.asarray(restored_flat), atol=0.05, rtol=0.1)


def test_quantize_2d_input_shape_restored(rng):
    x = jnp.asarray(rng.normal(size=(128, 256)), dtype=jnp.bfloat16)
    packed, state = quantize_4bit(x, blocksize=128, quant_type="nf4")
    assert state.shape == (128, 256)
    restored = dequantize_4bit(packed, quant_state=state)
    assert restored.size == x.size
    assert restored.dtype == jnp.bfloat16


def test_all_zero_block_roundtrips_to_zero():
    """Regression: an all-zero block has absmax 0; the reciprocal guard
    must keep codes finite so dequant returns exact zeros (was NaN)."""
    for quant_type in ("nf4", "fp4"):
        x = jnp.zeros(128, dtype=jnp.float32)
        packed, state = quantize_4bit(x, blocksize=64, quant_type=quant_type)
        assert not np.any(np.isnan(np.asarray(state.absmax)))
        out = dequantize_4bit(packed, state, blocksize=64, quant_type=quant_type)
        np.testing.assert_array_equal(np.asarray(out), np.zeros(128, np.float32))
    # Mixed case: one zero block among normal blocks.
    rng = np.random.default_rng(5)
    x = rng.normal(size=192).astype(np.float32)
    x[64:128] = 0.0
    packed, state = quantize_4bit(jnp.asarray(x), blocksize=64, quant_type="nf4")
    out = np.asarray(dequantize_4bit(packed, state, blocksize=64, quant_type="nf4"))
    np.testing.assert_array_equal(out[64:128], 0.0)
    assert np.all(np.isfinite(out))


def test_odd_input_size_4bit_raises():
    """4-bit packing needs an even element count; odd sizes must raise a
    clear error instead of silently dropping the last element."""
    with pytest.raises(ValueError, match="even input size"):
        quantize_4bit(jnp.ones(65, dtype=jnp.float32), blocksize=64, quant_type="nf4")
