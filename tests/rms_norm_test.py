# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for RMS norm ops vs the golden jnp reference.

Mirrors the reference's test strategy (``tests/rms_norm_test.py`` of the
reference repo): dtype sweep, odd hidden sizes, fused-add variant.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.normalization import fused_add_rms_norm, rms_norm
from conch_tpu.reference.normalization.rms_norm import (
    fused_add_rms_norm as fused_add_rms_norm_ref,
    rms_norm as rms_norm_ref,
)

DTYPES = [jnp.float32, jnp.bfloat16, jnp.float16]
SHAPES = [(1, 128), (7, 768), (32, 4096), (128, 1024), (5, 531)]
# bf16 tolerance matches the reference's own bf16 test tolerance
# (reference varlen bf16 2e-3, paged bf16 3e-2): reduction-order differences
# can flip values by 1 ulp near rounding boundaries.
TOLERANCES = {jnp.float32: 1e-5, jnp.float16: 1e-3, jnp.bfloat16: 2e-2}


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
def test_rms_norm(shape, dtype, rng):
    x = jnp.asarray(rng.normal(size=shape), dtype=dtype)
    w = jnp.asarray(rng.normal(size=shape[-1:]), dtype=dtype)
    eps = 1e-6

    out = rms_norm(x, w, eps)
    expected = rms_norm_ref(x, w, eps)

    assert out.dtype == x.dtype
    assert out.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(expected, dtype=np.float32),
        atol=TOLERANCES[dtype],
        rtol=TOLERANCES[dtype],
    )


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
def test_fused_add_rms_norm(shape, dtype, rng):
    x = jnp.asarray(rng.normal(size=shape), dtype=dtype)
    residual = jnp.asarray(rng.normal(size=shape), dtype=dtype)
    w = jnp.asarray(rng.normal(size=shape[-1:]), dtype=dtype)
    eps = 1e-6

    out, res = fused_add_rms_norm(x, residual, w, eps)
    expected_out, expected_res = fused_add_rms_norm_ref(x, residual, w, eps)

    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(expected_out, dtype=np.float32),
        atol=TOLERANCES[dtype],
        rtol=TOLERANCES[dtype],
    )
    np.testing.assert_allclose(
        np.asarray(res, dtype=np.float32),
        np.asarray(expected_res, dtype=np.float32),
        atol=TOLERANCES[dtype],
        rtol=TOLERANCES[dtype],
    )


def test_rms_norm_3d(rng):
    x = jnp.asarray(rng.normal(size=(2, 5, 256)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(256,)), dtype=jnp.float32)
    out = rms_norm(x, w, 1e-6)
    expected = rms_norm_ref(x, w, 1e-6)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5, rtol=1e-5)
