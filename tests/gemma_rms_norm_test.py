# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for Gemma RMS norm op vs the golden jnp reference."""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.normalization import gemma_rms_norm
from conch_tpu.reference.normalization.gemma_rms_norm import gemma_rms_norm as gemma_rms_norm_ref

DTYPES = [jnp.float32, jnp.bfloat16, jnp.float16]
SHAPES = [(1, 128), (16, 2048), (64, 3072), (3, 531)]
TOLERANCES = {jnp.float32: 1e-5, jnp.float16: 1e-3, jnp.bfloat16: 1e-2}


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", DTYPES)
@pytest.mark.parametrize("use_residual", [False, True])
def test_gemma_rms_norm(shape, dtype, use_residual, rng):
    x = jnp.asarray(rng.normal(size=shape), dtype=dtype)
    w = jnp.asarray(rng.normal(size=shape[-1:]), dtype=dtype)
    residual = jnp.asarray(rng.normal(size=shape), dtype=dtype) if use_residual else None
    eps = 1e-6

    result = gemma_rms_norm(x, w, eps, residual)
    expected = gemma_rms_norm_ref(x, w, eps, residual)

    if use_residual:
        out, res = result
        expected_out, expected_res = expected
        np.testing.assert_allclose(
            np.asarray(res, dtype=np.float32),
            np.asarray(expected_res, dtype=np.float32),
            atol=TOLERANCES[dtype],
            rtol=TOLERANCES[dtype],
        )
    else:
        out, expected_out = result, expected

    assert out.dtype == x.dtype
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(expected_out, dtype=np.float32),
        atol=TOLERANCES[dtype],
        rtol=TOLERANCES[dtype],
    )
