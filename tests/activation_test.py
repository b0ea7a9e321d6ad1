# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for SiLU-and-mul and GeLU-tanh-and-mul ops vs golden references."""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.activation import gelu_tanh_and_mul, silu_and_mul
from conch_tpu.reference.activation.gelu_tanh_and_mul import gelu_tanh_and_mul as gelu_ref
from conch_tpu.reference.activation.silu_and_mul import silu_and_mul as silu_ref

DTYPES = [jnp.float32, jnp.bfloat16, jnp.float16]
SHAPES = [(1, 256), (17, 2048), (128, 8192), (4, 1062)]
TOLERANCES = {jnp.float32: 1e-6, jnp.float16: 1e-3, jnp.bfloat16: 1e-2}


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("op,ref", [(silu_and_mul, silu_ref), (gelu_tanh_and_mul, gelu_ref)])
def test_activation_and_mul(shape, dtype, op, ref, rng):
    x = jnp.asarray(rng.normal(size=shape), dtype=dtype)

    out = op(x)
    expected = ref(x)

    assert out.dtype == x.dtype
    assert out.shape == shape[:-1] + (shape[-1] // 2,)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(expected, dtype=np.float32),
        atol=TOLERANCES[dtype],
        rtol=TOLERANCES[dtype],
    )


@pytest.mark.parametrize("op,ref", [(silu_and_mul, silu_ref), (gelu_tanh_and_mul, gelu_ref)])
def test_activation_3d(op, ref, rng):
    x = jnp.asarray(rng.normal(size=(2, 9, 512)), dtype=jnp.float32)
    out = op(x)
    expected = ref(x)
    assert out.shape == (2, 9, 256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-6, rtol=1e-6)
