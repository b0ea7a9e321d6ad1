# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for int8/fp8 static quantization ops.

Mirrors the reference's ``tests/int8_quant_kernels_test.py`` /
``tests/fp8_quant_test.py``: random tensors, off-by-one rounding tolerance
for int8 (atol=1), exact fp8 comparison vs the golden reference.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.quantization.fp8 import scaled_fp8_quant
from conch_tpu.ops.quantization.int8 import scaled_int8_quant
from conch_tpu.reference.quantization.fp8 import scaled_fp8_quant as fp8_ref
from conch_tpu.reference.quantization.int8 import scaled_int8_quant as int8_ref

SHAPES = [(1, 128), (16, 4096), (257, 1024), (7, 531)]
DTYPES = [jnp.float32, jnp.bfloat16, jnp.float16]


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
def test_static_scaled_int8_quant(shape, dtype, rng):
    x = jnp.asarray(rng.normal(size=shape) * 100, dtype=dtype)
    scale = jnp.asarray([1.7], dtype=jnp.float32)

    out, out_scale = scaled_int8_quant(x, scale)
    expected = int8_ref(x, scale)

    assert out.dtype == jnp.int8
    assert out.shape == shape
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.int32), np.asarray(expected, dtype=np.int32), atol=1
    )


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
def test_static_scaled_fp8_quant(shape, dtype, rng):
    x = jnp.asarray(rng.normal(size=shape) * 10, dtype=dtype)
    scale = jnp.asarray([0.5], dtype=jnp.float32)

    out, out_scale = scaled_fp8_quant(x, scale)
    expected = fp8_ref(x, scale)

    assert out.dtype == jnp.float8_e4m3fn
    assert out.shape == shape
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32), np.asarray(expected, dtype=np.float32), atol=1e-6
    )


def test_int8_saturation():
    x = jnp.asarray([[1e6, -1e6] + [0.0] * 126], dtype=jnp.float32)
    scale = jnp.asarray([1.0], dtype=jnp.float32)
    out, _ = scaled_int8_quant(x, scale)
    assert int(out[0, 0]) == 127
    assert int(out[0, 1]) == -128


def test_fp8_saturation():
    x = jnp.asarray([[1e6, -1e6] + [0.0] * 126], dtype=jnp.float32)
    scale = jnp.asarray([1.0], dtype=jnp.float32)
    out, _ = scaled_fp8_quant(x, scale)
    assert float(out[0, 0]) == 448.0
    assert float(out[0, 1]) == -448.0


def test_dynamic_not_implemented():
    x = jnp.zeros((4, 128), dtype=jnp.float32)
    with pytest.raises(NotImplementedError):
        scaled_int8_quant(x)
    with pytest.raises(NotImplementedError):
        scaled_fp8_quant(x)
