# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for the Gemma model family served through the engine."""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.gemma import (
    GemmaConfig,
    gemma_decode_step,
    gemma_prefill,
    init_gemma_kv_caches,
    init_gemma_params,
)
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def tiny_gemma():
    cfg = GemmaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        max_position=512, attn_logit_softcap=50.0, final_logit_softcap=30.0,
        dtype=jnp.float32,
    )
    return cfg, init_gemma_params(0, cfg, "bf16")


def test_gemma_forward_finite(tiny_gemma):
    cfg, params = tiny_gemma
    k, v = init_gemma_kv_caches(cfg, 16, 16)

    tokens = jnp.asarray([1, 2, 3, 4, 5], jnp.int32)
    positions = jnp.arange(5, dtype=jnp.int32)
    cu = jnp.asarray([0, 5], jnp.int32)
    bt = jnp.asarray([[0, 1]], jnp.int32)
    slots = jnp.arange(5, dtype=jnp.int32)

    logits, k, v = gemma_prefill(
        params, cfg, tokens, positions, cu, 8,
        jnp.asarray([5], jnp.int32), bt, slots, k, v,
    )
    assert logits.shape == (1, cfg.vocab_size)
    assert bool(jnp.all(jnp.isfinite(logits)))
    # Final softcap bounds the logits.
    assert float(jnp.max(jnp.abs(logits))) <= cfg.final_logit_softcap + 1e-3

    next_tok = jnp.argmax(logits, -1).astype(jnp.int32)
    logits2, k, v = gemma_decode_step(
        params, cfg, next_tok, jnp.asarray([5], jnp.int32), jnp.asarray([6], jnp.int32),
        bt, jnp.asarray([5], jnp.int32), k, v,
    )
    assert bool(jnp.all(jnp.isfinite(logits2)))


def test_gemma_served_by_engine(tiny_gemma):
    """The model-agnostic engine serves Gemma with its own step fns."""
    cfg, params = tiny_gemma
    engine = LLMEngine(
        params, cfg,
        EngineConfig(page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8),
        prefill_fn=gemma_prefill,
        decode_fn=gemma_decode_step,
    )
    outputs = engine.generate([[1, 2, 3], [9, 8, 7, 6, 5]], SamplingParams(max_tokens=5))
    assert all(len(o) == 5 for o in outputs)

    # Batch-of-one equivalence (same greedy determinism as Llama).
    solo = LLMEngine(
        params, cfg,
        EngineConfig(page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8),
        prefill_fn=gemma_prefill,
        decode_fn=gemma_decode_step,
    ).generate([[1, 2, 3]], SamplingParams(max_tokens=5))
    assert outputs[0] == solo[0]


def test_gemma_speculative_decoding_exact(tiny_gemma):
    """Prompt-lookup speculative decoding with Gemma's verify forward is
    greedy-exact: identical outputs to the plain Gemma engine."""
    from conch_tpu.models.gemma import gemma_verify_forward

    cfg, params = tiny_gemma
    ecfg = EngineConfig(page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8)
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [9, 8, 7, 6, 5]]
    plain = LLMEngine(params, cfg, ecfg, prefill_fn=gemma_prefill, decode_fn=gemma_decode_step)
    spec = LLMEngine(
        params, cfg,
        EngineConfig(
            page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
            num_speculative_tokens=4,
        ),
        prefill_fn=gemma_prefill,
        decode_fn=gemma_decode_step,
        verify_fn=gemma_verify_forward,
    )
    spec_out = spec.generate(prompts, SamplingParams(max_tokens=12))
    assert spec_out == plain.generate(prompts, SamplingParams(max_tokens=12))
    assert spec.spec_tokens_drafted > 0


def test_gemma_spec_decode_requires_verify_fn(tiny_gemma):
    cfg, params = tiny_gemma
    with pytest.raises(ValueError, match="verify_fn"):
        LLMEngine(
            params, cfg,
            EngineConfig(
                page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
                num_speculative_tokens=4,
            ),
            prefill_fn=gemma_prefill,
            decode_fn=gemma_decode_step,
        )


def test_gemma_int8_kv_decode_close_to_fp32():
    """Gemma decode with an int8 KV cache stays close to the fp32 cache."""
    import dataclasses

    from conch_tpu.models.gemma import GemmaConfig, gemma_decode_step, init_gemma_params

    cfg = GemmaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=32, max_position=128,
        dtype=jnp.float32, kv_cache_scale=0.01,
    )
    params = init_gemma_params(0, cfg)
    rng = np.random.default_rng(5)
    batch, num_pages, page_size = 2, 8, 16
    token_ids = jnp.asarray(rng.integers(0, cfg.vocab_size, batch), jnp.int32)
    positions = jnp.zeros(batch, jnp.int32)
    seq_lens = positions + 1
    bt = jnp.asarray(rng.permutation(num_pages).reshape(batch, 4), jnp.int32)
    slots = bt[jnp.arange(batch), 0] * page_size

    def run(cache_dtype):
        shape = (cfg.num_layers, num_pages, cfg.num_kv_heads, page_size, cfg.head_dim)
        kc = jnp.zeros(shape, cache_dtype)
        vc = jnp.zeros(shape, cache_dtype)
        logits, _, _ = gemma_decode_step(params, cfg, token_ids, positions, seq_lens, bt, slots, kc, vc)
        return np.asarray(logits)

    np.testing.assert_allclose(run(jnp.int8), run(jnp.float32), atol=0.1, rtol=0.1)


def test_gemma_fused_params_parity(tiny_gemma):
    """fuse_llama_params works on Gemma layer dicts: fused wqkv/w_gateup
    prefill+decode logits match the unfused model."""
    import numpy as np

    from conch_tpu.models.llama import fuse_llama_params

    cfg, params = tiny_gemma
    fused = fuse_llama_params(params)
    assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
    assert "w_gateup" in fused["layers"]

    tokens = jnp.asarray([1, 2, 3, 4, 5], jnp.int32)
    positions = jnp.arange(5, dtype=jnp.int32)
    cu = jnp.asarray([0, 5], jnp.int32)
    bt = jnp.asarray([[0, 1]], jnp.int32)
    slots = jnp.arange(5, dtype=jnp.int32)
    outs = []
    for p in (params, fused):
        k, v = init_gemma_kv_caches(cfg, 16, 16)
        lo, k, v = gemma_prefill(
            p, cfg, tokens, positions, cu, 8, jnp.asarray([5], jnp.int32), bt, slots, k, v
        )
        lo2, _, _ = gemma_decode_step(
            p, cfg, jnp.argmax(lo, -1).astype(jnp.int32), jnp.asarray([5], jnp.int32),
            jnp.asarray([6], jnp.int32), bt, jnp.asarray([5], jnp.int32), k, v,
        )
        outs.append((np.asarray(lo), np.asarray(lo2)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=2e-4, rtol=1e-4)
