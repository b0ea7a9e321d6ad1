# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""DeepSeek-V2 (MLA) through the serving engine.

The HF-oracle parity lives in ``hf_convert_test.py`` (env-gated); these
always-on tests prove *self-consistency* of the paged incremental paths:
engine greedy output (chunked prefill + MLA decode over the paged latent
cache) must equal the full-context verify-forward argmax replay, across
plain, multi-step, and speculative decode, plus parallel sampling over
the single packed cache.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.deepseek import (
    DeepseekV2Config,
    deepseek_decode_step,
    deepseek_prefill,
    deepseek_verify_forward,
    init_deepseek_kv_cache,
    init_deepseek_params,
)
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def moe_model():
    cfg = DeepseekV2Config(
        vocab_size=256, hidden_size=64, num_layers=3, num_heads=4,
        kv_lora_rank=32, qk_rope_head_dim=16, qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=32, intermediate_size=64, first_k_dense_replace=1,
        dtype=jnp.float32, moe_capacity_factor=100.0,
    )
    return cfg, init_deepseek_params(0, cfg)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _engine(cfg, params, **over):
    defaults = dict(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=32, enable_prefix_caching=False,
    )
    defaults.update(over)
    return LLMEngine(
        params, cfg, EngineConfig(**defaults),
        prefill_fn=deepseek_prefill, decode_fn=deepseek_decode_step,
        verify_fn=deepseek_verify_forward,
    )


def _replay_argmax(params, cfg, tokens):
    """Full-context verify-forward: argmax prediction at every position."""
    t = len(tokens)
    pages = -(-t // 16) + 1
    cache = init_deepseek_kv_cache(cfg, pages, 16, dtype=jnp.float32)
    positions = jnp.arange(t, dtype=jnp.int32)
    logits, _, _ = deepseek_verify_forward(
        params, cfg, jnp.asarray(tokens, jnp.int32), positions,
        jnp.asarray([0, t], jnp.int32), t, jnp.asarray([t], jnp.int32),
        jnp.arange(pages, dtype=jnp.int32)[None, :], positions,
        cache, jnp.zeros((0,), jnp.float32),
    )
    return np.asarray(jnp.argmax(logits, -1))


@pytest.mark.parametrize(
    "over",
    [{}, {"multi_step_decode": 3}, {"num_speculative_tokens": 3}],
    ids=["plain", "multi_step", "spec"],
)
def test_deepseek_engine_greedy_consistent(moe_model, rng, over):
    cfg, params = moe_model
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (45, 20, 7)]
    outs = _engine(cfg, params, **over).generate(prompts, SamplingParams(max_tokens=10))
    for prompt, out in zip(prompts, outs):
        assert len(out) == 10
        preds = _replay_argmax(params, cfg, prompt + out)
        for j, tok in enumerate(out):
            assert preds[len(prompt) - 1 + j] == tok, (j, out)


def test_deepseek_parallel_sampling(moe_model, rng):
    """n>1 forks the single packed MLA cache (empty v_caches path)."""
    cfg, params = moe_model
    prompt = list(rng.integers(0, cfg.vocab_size, size=37))
    single = _engine(cfg, params).generate([prompt], SamplingParams(max_tokens=8))[0]
    (outs,) = _engine(cfg, params).generate([prompt], SamplingParams(max_tokens=8, n=3))
    assert outs == [single, single, single]


def test_deepseek_dense_only(rng):
    """n_routed_experts=0: every layer dense, single scan segment."""
    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        kv_lora_rank=32, qk_rope_head_dim=16, qk_nope_head_dim=32, v_head_dim=32,
        intermediate_size=64, dtype=jnp.float32,
    )
    params = init_deepseek_params(1, cfg)
    prompt = list(rng.integers(0, cfg.vocab_size, size=21))
    out = _engine(cfg, params).generate([prompt], SamplingParams(max_tokens=6))[0]
    preds = _replay_argmax(params, cfg, prompt + out)
    for j, tok in enumerate(out):
        assert preds[len(prompt) - 1 + j] == tok


def test_deepseek_int8_latent_cache_consistent(moe_model, rng):
    """Engine with an int8 latent cache == full-context replay with the
    SAME quantized cache (quantization is deterministic per token, so
    incremental and one-shot writes agree exactly)."""
    cfg, params = moe_model
    prompt = list(rng.integers(0, cfg.vocab_size, size=33))
    eng = _engine(cfg, params)
    eng_q = LLMEngine(
        params, cfg,
        EngineConfig(page_size=16, num_pages=64, max_batch_size=4,
                     max_pages_per_seq=8, max_prefill_tokens=32,
                     enable_prefix_caching=False),
        cache_dtype=jnp.int8,
        prefill_fn=deepseek_prefill, decode_fn=deepseek_decode_step,
        verify_fn=deepseek_verify_forward,
    )
    out = eng_q.generate([prompt], SamplingParams(max_tokens=8))[0]
    assert eng_q.k_caches.dtype == jnp.int8

    t = len(prompt) + len(out)
    pages = -(-t // 16) + 1
    cache = init_deepseek_kv_cache(cfg, pages, 16, dtype=jnp.int8)
    positions = jnp.arange(t, dtype=jnp.int32)
    logits, _, _ = deepseek_verify_forward(
        params, cfg, jnp.asarray(prompt + out, jnp.int32), positions,
        jnp.asarray([0, t], jnp.int32), t, jnp.asarray([t], jnp.int32),
        jnp.arange(pages, dtype=jnp.int32)[None, :], positions,
        cache, jnp.zeros((0,), jnp.float32),
    )
    preds = np.asarray(jnp.argmax(logits, -1))
    for j, tok in enumerate(out):
        assert preds[len(prompt) - 1 + j] == tok, (j, out)


def test_deepseek_quantized_weights(rng):
    """int8 projections through QuantizedLinear serve self-consistently."""
    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        kv_lora_rank=32, qk_rope_head_dim=16, qk_nope_head_dim=32, v_head_dim=32,
        intermediate_size=64, dtype=jnp.float32,
    )
    params = init_deepseek_params(2, cfg, quant_mode="int8", group_size=32)
    prompt = list(rng.integers(0, cfg.vocab_size, size=19))
    out = _engine(cfg, params).generate([prompt], SamplingParams(max_tokens=6))[0]
    preds = _replay_argmax(params, cfg, prompt + out)
    for j, tok in enumerate(out):
        assert preds[len(prompt) - 1 + j] == tok


def test_requantize_matches_native_init(rng):
    """requantize(bf16 tree) serves identically to a natively-quantized
    init from the same seed (same quantization math, same layout)."""
    from conch_tpu.models.deepseek import requantize_deepseek_params

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        kv_lora_rank=32, qk_rope_head_dim=16, qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=32, intermediate_size=64, first_k_dense_replace=1,
        dtype=jnp.float32, moe_capacity_factor=100.0,
    )
    dense = init_deepseek_params(3, cfg, quant_mode="bf16")
    requant = requantize_deepseek_params(dense, cfg, "int8", group_size=32)
    prompt = list(rng.integers(0, cfg.vocab_size, size=17))
    out = _engine(cfg, requant).generate([prompt], SamplingParams(max_tokens=5))[0]
    preds = _replay_argmax(requant, cfg, prompt + out)
    for j, tok in enumerate(out):
        assert preds[len(prompt) - 1 + j] == tok


def test_deepseek_fused_params_parity(moe_model, rng):
    """fuse_deepseek_params ([wq|w_kv_a], gate|up, shared gate|up): fused
    verify-forward logits match the unfused model."""
    from conch_tpu.models.deepseek import fuse_deepseek_params

    cfg, params = moe_model
    fused = fuse_deepseek_params(params)
    assert "wq_kva" in fused["layers_moe"] and "w_kv_a" not in fused["layers_moe"]
    assert "w_gateup" in fused["layers_dense"]
    assert "shared_gateup" in fused["layers_moe"]
    tokens = rng.integers(0, cfg.vocab_size, 12).tolist()
    a = _replay_argmax(params, cfg, tokens)
    b = _replay_argmax(fused, cfg, tokens)
    np.testing.assert_array_equal(a, b)

    # full-logit closeness, not just argmax
    t = len(tokens)
    pages = -(-t // 16) + 1
    outs = []
    for p in (params, fused):
        cache = init_deepseek_kv_cache(cfg, pages, 16, dtype=jnp.float32)
        positions = jnp.arange(t, dtype=jnp.int32)
        logits, _, _ = deepseek_verify_forward(
            p, cfg, jnp.asarray(tokens, jnp.int32), positions,
            jnp.asarray([0, t], jnp.int32), t, jnp.asarray([t], jnp.int32),
            jnp.arange(pages, dtype=jnp.int32)[None, :], positions,
            cache, jnp.zeros((0,), jnp.float32),
        )
        outs.append(np.asarray(logits))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-4, rtol=1e-4)


def test_deepseek_qlora_fused_parity(rng):
    """q-LoRA variant: fused [wq_a|w_kv_a] with the in-path q_a_norm."""
    from conch_tpu.models.deepseek import fuse_deepseek_params

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        q_lora_rank=32, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32, intermediate_size=64,
        dtype=jnp.float32,
    )
    params = init_deepseek_params(7, cfg)
    fused = fuse_deepseek_params(params)
    assert "wq_kva" in fused["layers_dense"] and "wq_a" not in fused["layers_dense"]
    tokens = rng.integers(0, cfg.vocab_size, 10).tolist()
    np.testing.assert_array_equal(
        _replay_argmax(params, cfg, tokens), _replay_argmax(fused, cfg, tokens)
    )
