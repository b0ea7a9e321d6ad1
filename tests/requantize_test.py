# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Post-training quantization: requantize_llama_params round-trips.

Requantizing a dense param tree must produce the same tree layout (and for
identical source weights, identical arrays) as initializing natively in
that mode, and the quantized forward must stay close to the dense one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.llama import LlamaConfig, init_llama_params, requantize_llama_params
from conch_tpu.parallel.train import dense_forward

CFG = LlamaConfig(
    vocab_size=128, hidden_size=128, intermediate_size=192, num_layers=2,
    num_heads=4, num_kv_heads=2, head_dim=32, max_position=64,
)


@pytest.mark.parametrize("mode", ["int4", "int8", "nf4"])
def test_requantize_matches_native_init(mode):
    dense = init_llama_params(0, CFG, "bf16")
    native = init_llama_params(0, CFG, mode, group_size=32)
    requant = requantize_llama_params(dense, CFG, mode, group_size=32)

    native_leaves, native_tree = jax.tree_util.tree_flatten(native)
    requant_leaves, requant_tree = jax.tree_util.tree_flatten(requant)
    assert native_tree == requant_tree
    for a, b in zip(native_leaves, requant_leaves):
        assert a.shape == b.shape and a.dtype == b.dtype
        # Same seed -> same source weights; requantize starts from the
        # bf16-rounded copy, so integer codes may differ in the last bit
        # for values near a quantization boundary — but rarely.
        same = np.mean(np.asarray(a, np.float32) == np.asarray(b, np.float32))
        assert same > 0.5, f"arrays disagree on {1 - same:.1%} of elements"


def test_requantized_forward_close_to_dense():
    dense = init_llama_params(0, CFG, "bf16")
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, CFG.vocab_size, size=(2, 32)))
    ref = dense_forward(dense, CFG, tokens)
    for mode in ("int8", "int4", "nf4"):
        qp = requantize_llama_params(dense, CFG, mode, group_size=32)
        out = dense_forward(qp, CFG, tokens)
        # Random-init logits are near zero; compare on absolute scale.
        err = float(jnp.max(jnp.abs(out - ref)))
        scale = float(jnp.std(ref)) + 1e-6
        assert err / scale < 1.5, f"{mode}: err {err} vs logit std {scale}"
