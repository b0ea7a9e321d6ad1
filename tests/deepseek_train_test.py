# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""DeepSeek training path: dense forward parity + GSPMD train step.

The dense (training) forward reconstructs per-head K/V from the SAME
absorbed W_uk/W_uv parameters the serving path folds into q/out — so
dense-vs-paged logit parity proves the two formulations are the same
function, and the train step optimizes exactly what serving runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from conch_tpu.models.deepseek import (
    DeepseekV2Config,
    deepseek_dense_forward,
    deepseek_verify_forward,
    init_deepseek_kv_cache,
    init_deepseek_params,
    make_deepseek_train_step,
)


@pytest.fixture(scope="module")
def model():
    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, num_layers=3, num_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=32, intermediate_size=64, first_k_dense_replace=1,
        dtype=jnp.float32, moe_capacity_factor=100.0,
    )
    return cfg, init_deepseek_params(0, cfg)


def test_dense_forward_matches_paged_verify(model):
    """Training forward == serving verify forward, full logits."""
    cfg, params = model
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, cfg.vocab_size, size=24)
    dense_logits, aux = deepseek_dense_forward(
        params, cfg, jnp.asarray(tokens[None], jnp.int32)
    )
    assert np.isfinite(float(aux))

    t = len(tokens)
    cache = init_deepseek_kv_cache(cfg, 4, 16, dtype=jnp.float32)
    positions = jnp.arange(t, dtype=jnp.int32)
    paged_logits, _, _ = deepseek_verify_forward(
        params, cfg, jnp.asarray(tokens, jnp.int32), positions,
        jnp.asarray([0, t], jnp.int32), t, jnp.asarray([t], jnp.int32),
        jnp.arange(4, dtype=jnp.int32)[None, :], positions,
        cache, jnp.zeros((0,), jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(dense_logits[0]), np.asarray(paged_logits), atol=2e-3, rtol=2e-3
    )


def test_remat_grads_match(model):
    cfg, params = model
    rng = np.random.default_rng(1)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 16)), jnp.int32)

    def loss(p, remat):
        logits, aux = deepseek_dense_forward(p, cfg, tokens, remat=remat)
        return jnp.mean(logits**2) + aux

    g_plain = jax.grad(lambda p: loss(p, False))(params)
    g_remat = jax.grad(lambda p: loss(p, True))(params)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4),
        g_plain, g_remat,
    )


def test_gspmd_train_step(model):
    """2x4 mesh: sharded loss equals the single-device loss; params move."""
    cfg, params = model
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, (4, 16)), jnp.int32)

    def single_loss(p):
        logits, aux = deepseek_dense_forward(p, cfg, tokens)
        targets = tokens[:, 1:]
        lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0]
        return float(jnp.mean(nll) + 0.01 * aux)

    expected = single_loss(params)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 4), ("data", "model"))
    step, init_opt, batch_sharding = make_deepseek_train_step(
        mesh, cfg, params, aux_coef=0.01, remat=True
    )
    sharded = jax.device_put(tokens, batch_sharding)
    # the step donates its params: feed it a copy, keep the original
    donated = jax.tree.map(jnp.copy, params)
    new_params, _, loss = step(donated, init_opt(params), sharded)
    np.testing.assert_allclose(float(loss), expected, atol=2e-3, rtol=2e-3)
    moved = jax.tree.leaves(
        jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), params, new_params)
    )
    assert max(moved) > 0.0, "params did not update"
