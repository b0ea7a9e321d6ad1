# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Unit tests for per-request sampling (greedy / temperature / top-k / top-p)."""

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.serving.sampling import sample_tokens


def _logits(rows):
    return jnp.asarray(np.array(rows, dtype=np.float32))


def test_greedy_rows_take_argmax():
    logits = _logits([[0.1, 2.0, 0.3, 0.0], [5.0, 1.0, 0.0, 0.0]])
    toks = sample_tokens(logits, jax.random.PRNGKey(0), jnp.zeros(2))
    np.testing.assert_array_equal(np.asarray(toks), [1, 0])


def test_per_row_top_k_one_is_greedy():
    """A top_k=1 row is deterministic regardless of temperature; a top_k=0
    row in the same batch is unconstrained."""
    rng = np.random.default_rng(0)
    logits = _logits(rng.normal(size=(4, 64)))
    temps = jnp.full((4,), 3.0)
    top_k = jnp.asarray([1, 1, 0, 1], dtype=jnp.int32)
    for seed in range(8):
        toks = np.asarray(sample_tokens(logits, jax.random.PRNGKey(seed), temps, top_k=top_k))
        greedy = np.argmax(np.asarray(logits), axis=-1)
        np.testing.assert_array_equal(toks[[0, 1, 3]], greedy[[0, 1, 3]])


def test_top_k_restricts_support():
    """Sampled tokens always come from each row's own top-k set."""
    rng = np.random.default_rng(1)
    logits = _logits(rng.normal(size=(3, 32)))
    top_k = jnp.asarray([2, 5, 3], dtype=jnp.int32)
    allowed = [set(np.argsort(row)[-k:]) for row, k in zip(np.asarray(logits), [2, 5, 3])]
    for seed in range(16):
        toks = np.asarray(
            sample_tokens(logits, jax.random.PRNGKey(seed), jnp.ones(3), top_k=top_k)
        )
        for t, ok in zip(toks, allowed):
            assert t in ok


def test_top_p_restricts_support():
    """A tiny top_p keeps only the head of the distribution."""
    logits = _logits([[10.0, 9.0, 0.0, -5.0]])
    for seed in range(16):
        toks = np.asarray(
            sample_tokens(
                logits, jax.random.PRNGKey(seed), jnp.ones(1),
                top_p=jnp.asarray([0.5]),
            )
        )
        assert toks[0] in (0, 1)


def test_top_k_scalar_broadcasts():
    logits = _logits([[0.0, 1.0, 2.0], [3.0, 2.0, 1.0]])
    toks = np.asarray(sample_tokens(logits, jax.random.PRNGKey(0), jnp.full((2,), 2.0), top_k=1))
    np.testing.assert_array_equal(toks, [2, 0])
