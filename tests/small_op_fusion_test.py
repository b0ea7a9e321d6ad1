# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Both branches of the small-op fusion dispatch agree (ADVICE r2).

``fuse_small_op`` routes decode-sized (<=128 token) elementwise ops to the
jnp reference so XLA fuses them into neighbors; CPU CI normally only
exercises the Pallas branch (interpret mode disables fusion). This test
forces the FUSED branch on CPU by monkeypatching ``use_interpret_mode`` in
``conch_tpu.kernels.common`` (read dynamically inside ``fuse_small_op``;
no Pallas kernel executes on the fused path, so lying about the backend is
safe) and checks both branches produce the same numbers at decode shapes.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import conch_tpu.kernels.common as kcommon
from conch_tpu.ops.activation import gelu_tanh_and_mul, silu_and_mul
from conch_tpu.ops.normalization import fused_add_rms_norm, gemma_rms_norm, rms_norm


def _force_fused(monkeypatch):
    monkeypatch.setenv("CONCH_SMALL_OP_FUSION", "1")
    monkeypatch.setattr(kcommon, "use_interpret_mode", lambda: False)


CASES = [
    ("silu_and_mul", lambda x, w: silu_and_mul(x), True),
    ("gelu_tanh_and_mul", lambda x, w: gelu_tanh_and_mul(x), True),
    ("rms_norm", lambda x, w: rms_norm(x, w, 1e-6), False),
    ("gemma_rms_norm", lambda x, w: gemma_rms_norm(x, w, 1e-6), False),
]


@pytest.mark.parametrize("num_tokens", [1, 8, 128])
@pytest.mark.parametrize("name,fn,doubled", CASES)
def test_fused_branch_matches_kernel(name, fn, doubled, num_tokens, monkeypatch, rng):
    d = 256
    x = jnp.asarray(rng.normal(size=(num_tokens, 2 * d if doubled else d)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(d,)), jnp.bfloat16)

    out_kernel = np.asarray(fn(x, w), dtype=np.float32)
    _force_fused(monkeypatch)
    out_fused = np.asarray(fn(x, w), dtype=np.float32)

    np.testing.assert_allclose(out_fused, out_kernel, atol=2e-2, rtol=2e-2)


def test_fused_add_rms_norm_both_branches(monkeypatch, rng):
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)
    res = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(256,)), jnp.bfloat16)

    out_k, res_k = fused_add_rms_norm(x, res, w, 1e-6)
    _force_fused(monkeypatch)
    out_f, res_f = fused_add_rms_norm(x, res, w, 1e-6)

    np.testing.assert_allclose(
        np.asarray(out_f, np.float32), np.asarray(out_k, np.float32), atol=2e-2, rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(res_f, np.float32), np.asarray(res_k, np.float32), atol=2e-2, rtol=2e-2
    )


def test_large_shapes_never_fuse(monkeypatch, rng):
    """Above the threshold the kernel branch must be taken even with the
    env flag on (fusion is a decode-size optimization, not a replacement)."""
    from conch_tpu.ops.common import fuse_small_op

    monkeypatch.setenv("CONCH_SMALL_OP_FUSION", "1")
    monkeypatch.setattr(kcommon, "use_interpret_mode", lambda: False)
    assert fuse_small_op(128)
    assert not fuse_small_op(129)
    monkeypatch.setenv("CONCH_SMALL_OP_FUSION", "0")
    assert not fuse_small_op(8)
