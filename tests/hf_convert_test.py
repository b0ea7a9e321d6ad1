# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""HF-checkpoint conversion vs the transformers oracle (env-gated).

The strongest model-correctness check available offline: a randomly
initialized ``transformers`` model IS the HF architecture definition, so
matching its full logits through our converted params + paged serving
forward proves the conch_tpu model family is bit-faithful Llama/Mixtral
(RoPE convention, GQA head layout, norm placement, SwiGLU, tied heads).

Run with: CONCH_ENABLE_TORCH=1 python -m pytest tests/hf_convert_test.py
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu import envs

if not envs.CONCH_ENABLE_TORCH:
    pytest.skip("CONCH_ENABLE_TORCH=1 to enable transformers oracle tests", allow_module_level=True)

import torch  # noqa: E402
import transformers  # noqa: E402

from conch_tpu.models.hf import llama_params_from_hf, mixtral_params_from_hf  # noqa: E402
from conch_tpu.models.llama import LlamaConfig, init_kv_caches, llama_verify_forward  # noqa: E402
from conch_tpu.models.moe import MoEConfig, init_moe_kv_caches, mixtral_verify_forward  # noqa: E402


def _forward_ours(verify_fn, params, cfg, tokens, num_kv_heads, head_dim, init_caches, moe_cfg=None):
    """All-token logits through the paged varlen forward (one sequence)."""
    t = len(tokens)
    page_size = 16
    num_pages = -(-t // page_size) + 1
    kc, vc = init_caches
    bt = jnp.arange(num_pages, dtype=jnp.int32)[None, :]
    positions = jnp.arange(t, dtype=jnp.int32)
    slots = positions  # identity block table: slot == position
    cu = jnp.asarray([0, t], jnp.int32)
    logits, _, _ = verify_fn(
        params, moe_cfg or cfg, jnp.asarray(tokens, jnp.int32), positions, cu, t,
        jnp.asarray([t], jnp.int32), bt, slots, kc, vc,
    )
    return np.asarray(logits)


def test_llama_conversion_matches_transformers():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        attention_bias=False, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()

    tokens = [3, 17, 99, 4, 4, 127, 56, 23, 8, 1]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_position=128,
        rope_theta=10000.0, dtype=jnp.float32,
    )
    params = llama_params_from_hf(model.state_dict(), cfg, quant_mode="bf16")
    ours = _forward_ours(
        llama_verify_forward, params, cfg, tokens, 2, 16,
        init_kv_caches(cfg, 8, 16),
    )

    # bf16 weights vs fp32 torch: compare directions, not bits.
    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours[: len(tokens)] - ours[: len(tokens)].mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))


def test_llama_conversion_tied_embeddings():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=64, tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()
    state = {k: v for k, v in model.state_dict().items() if k != "lm_head.weight"}

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=1,
        num_heads=2, num_kv_heads=2, head_dim=16, max_position=64, dtype=jnp.float32,
    )
    params = llama_params_from_hf(state, cfg)
    tokens = [5, 9, 23, 1]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()
    ours = _forward_ours(llama_verify_forward, params, cfg, tokens, 2, 16, init_kv_caches(cfg, 8, 16))
    np.testing.assert_array_equal(ours[: len(tokens)].argmax(-1), hf_logits.argmax(-1))


def test_mixtral_conversion_matches_transformers():
    hf_cfg = transformers.MixtralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=2,
        max_position_embeddings=64, num_local_experts=4, num_experts_per_tok=2,
        rope_theta=10000.0,
    )
    torch.manual_seed(2)
    model = transformers.MixtralForCausalLM(hf_cfg).eval()

    tokens = [3, 17, 9, 4, 60, 2]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = MoEConfig(
        llama=LlamaConfig(
            vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
            num_heads=2, num_kv_heads=2, head_dim=16, max_position=64,
            rope_theta=10000.0, dtype=jnp.float32,
        ),
        num_experts=4, top_k=2, capacity_factor=4.0,
    )
    params = mixtral_params_from_hf(model.state_dict(), cfg)
    ours = _forward_ours(
        mixtral_verify_forward, params, cfg.llama, tokens, 2, 16,
        init_moe_kv_caches(cfg, 8, 16), moe_cfg=cfg,
    )
    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours[: len(tokens)] - ours[: len(tokens)].mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))


def test_gemma_conversion_matches_transformers():
    from conch_tpu.models.gemma import GemmaConfig, gemma_verify_forward, init_gemma_kv_caches
    from conch_tpu.models.hf import gemma_params_from_hf

    hf_cfg = transformers.GemmaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(3)
    model = transformers.GemmaForCausalLM(hf_cfg).eval()

    tokens = [3, 17, 9, 4, 60, 2]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = GemmaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=64,
        rope_theta=10000.0, dtype=jnp.float32,
    )
    params = gemma_params_from_hf(model.state_dict(), cfg)
    t = len(tokens)
    kc, vc = init_gemma_kv_caches(cfg, 8, 16)
    logits, _, _ = gemma_verify_forward(
        params, cfg, jnp.asarray(tokens, jnp.int32), jnp.arange(t, dtype=jnp.int32),
        jnp.asarray([0, t], jnp.int32), t, jnp.asarray([t], jnp.int32),
        jnp.arange(8, dtype=jnp.int32)[None, :], jnp.arange(t, dtype=jnp.int32), kc, vc,
    )
    ours = np.asarray(logits)[:t]
    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours - ours.mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))


def test_qwen2_conversion_matches_transformers():
    """Qwen2 = Llama family + q/k/v biases; full-logit parity."""
    hf_cfg = transformers.Qwen2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(4)
    model = transformers.Qwen2ForCausalLM(hf_cfg).eval()

    tokens = [3, 17, 9, 4, 60, 2]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=64,
        rope_theta=10000.0, dtype=jnp.float32, attention_bias=True,
    )
    params = llama_params_from_hf(model.state_dict(), cfg)
    assert "bq" in params["layers"], "biases must be picked up"
    ours = _forward_ours(
        llama_verify_forward, params, cfg, tokens, 2, 8, init_kv_caches(cfg, 8, 16)
    )
    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours[: len(tokens)] - ours[: len(tokens)].mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))


def test_mistral_sliding_window_matches_transformers():
    """Mistral = Llama + sliding-window attention; parity requires the
    window mask to be bit-faithful (seq 24 >> window 8, so a missing or
    misaligned window would flip argmaxes)."""
    hf_cfg = transformers.MistralConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        sliding_window=8, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(5)
    model = transformers.MistralForCausalLM(hf_cfg).eval()

    rng = np.random.default_rng(6)
    tokens = rng.integers(0, 64, 24).tolist()
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=64,
        rope_theta=10000.0, dtype=jnp.float32, sliding_window=8,
    )
    params = llama_params_from_hf(model.state_dict(), cfg)
    ours = _forward_ours(llama_verify_forward, params, cfg, tokens, 2, 8, init_kv_caches(cfg, 8, 16))

    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours[: len(tokens)] - ours[: len(tokens)].mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))

    # Guard against the oracle silently ignoring the window: a
    # no-window run must DISAGREE beyond the window.
    cfg_nw = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=64,
        rope_theta=10000.0, dtype=jnp.float32,
    )
    params_nw = llama_params_from_hf(model.state_dict(), cfg_nw)
    ours_nw = _forward_ours(
        llama_verify_forward, params_nw, cfg_nw, tokens, 2, 8, init_kv_caches(cfg_nw, 8, 16)
    )
    tail = slice(10, len(tokens))
    assert np.abs(ours[tail] - ours_nw[tail]).max() > 1e-3


def test_gemma2_conversion_matches_transformers():
    """Gemma-2: sandwich norms, softcaps, and ALTERNATING local/global
    attention (seq 24 >> window 6 so a wrong alternation flips logits)."""
    from conch_tpu.models.gemma import GemmaConfig, gemma_verify_forward, init_gemma_kv_caches
    from conch_tpu.models.hf import gemma_params_from_hf

    hf_cfg = transformers.Gemma2Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, max_position_embeddings=64, rope_theta=10000.0,
        sliding_window=6, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=8,
        hidden_activation="gelu_pytorch_tanh", attn_implementation="eager",
    )
    torch.manual_seed(8)
    model = transformers.Gemma2ForCausalLM(hf_cfg).eval()

    rng = np.random.default_rng(9)
    tokens = rng.integers(0, 64, 24).tolist()
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = GemmaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=4,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=64,
        rope_theta=10000.0, dtype=jnp.float32, gemma2=True, sliding_window=6,
        attn_logit_softcap=50.0, final_logit_softcap=30.0, query_pre_attn_scalar=8.0,
    )
    params = gemma_params_from_hf(model.state_dict(), cfg)
    assert "pre_ff_norm" in params["layers"]

    t = len(tokens)
    kc, vc = init_gemma_kv_caches(cfg, 8, 16)
    logits, _, _ = gemma_verify_forward(
        params, cfg, jnp.asarray(tokens, jnp.int32), jnp.arange(t, dtype=jnp.int32),
        jnp.asarray([0, t], jnp.int32), t, jnp.asarray([t], jnp.int32),
        jnp.arange(8, dtype=jnp.int32)[None, :], jnp.arange(t, dtype=jnp.int32), kc, vc,
    )
    ours = np.asarray(logits)[:t]
    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours - ours.mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))


def test_llama31_rope_scaling_matches_transformers():
    """Llama-3.1-style rope scaling: the llama3 frequency-band remap must
    match transformers exactly (positions past the original context make
    the scaled/unscaled caches diverge hard)."""
    hf_cfg = transformers.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=False,
        rope_scaling={
            "rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
            "high_freq_factor": 4.0, "original_max_position_embeddings": 32,
        },
    )
    torch.manual_seed(10)
    model = transformers.LlamaForCausalLM(hf_cfg).eval()

    rng = np.random.default_rng(11)
    tokens = rng.integers(0, 64, 48).tolist()  # past the original 32-ctx
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_position=256,
        rope_theta=10000.0, dtype=jnp.float32,
        rope_scaling=(
            ("rope_type", "llama3"), ("factor", 8.0), ("low_freq_factor", 1.0),
            ("high_freq_factor", 4.0), ("original_max_position_embeddings", 32),
        ),
    )
    params = llama_params_from_hf(model.state_dict(), cfg)
    ours = _forward_ours(llama_verify_forward, params, cfg, tokens, 2, 16, init_kv_caches(cfg, 8, 16))
    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours[: len(tokens)] - ours[: len(tokens)].mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))

    # Anti-false-positive: an UNscaled run must diverge at long range.
    cfg_u = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=16, max_position=256,
        rope_theta=10000.0, dtype=jnp.float32,
    )
    ours_u = _forward_ours(
        llama_verify_forward, llama_params_from_hf(model.state_dict(), cfg_u), cfg_u,
        tokens, 2, 16, init_kv_caches(cfg_u, 8, 16),
    )
    assert np.abs(ours[: len(tokens)] - ours_u[: len(tokens)]).max() > 1e-3


def test_phi3_conversion_matches_transformers():
    """Phi-3 = Llama arch with fused qkv/gate_up projections: the split
    ordering must be exact or logits scramble."""
    from conch_tpu.models.hf import phi3_params_from_hf

    hf_cfg = transformers.Phi3Config(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, rope_theta=10000.0,
        tie_word_embeddings=False, attn_implementation="eager",
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(12)
    model = transformers.Phi3ForCausalLM(hf_cfg).eval()

    tokens = [3, 17, 9, 4, 60, 2, 33, 21]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=64,
        rope_theta=10000.0, dtype=jnp.float32,
    )
    params = phi3_params_from_hf(model.state_dict(), cfg)
    ours = _forward_ours(llama_verify_forward, params, cfg, tokens, 2, 8, init_kv_caches(cfg, 8, 16))
    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours[: len(tokens)] - ours[: len(tokens)].mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))


@pytest.mark.parametrize("q_lora", [None, 24])
def test_deepseek_conversion_matches_transformers(q_lora):
    """DeepSeek-V2 MLA + MoE (shared experts, dense first layer) full-logit
    parity against the HF eager oracle — proves the interleaved rope,
    absorbed kv_b split, gate softmax-then-topk, and MLA kernel end to end."""
    from transformers.models.deepseek_v2 import DeepseekV2Config as HFDeepseekV2Config
    from transformers.models.deepseek_v2 import DeepseekV2ForCausalLM

    from conch_tpu.models.deepseek import (
        DeepseekV2Config,
        deepseek_verify_forward,
        init_deepseek_kv_cache,
    )
    from conch_tpu.models.hf import deepseek_params_from_hf

    hf_cfg = HFDeepseekV2Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=q_lora, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=32, intermediate_size=64,
        first_k_dense_replace=1, routed_scaling_factor=1.5,
        norm_topk_prob=False, topk_method="greedy",
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, attention_bias=False,
    )
    torch.manual_seed(5)
    model = DeepseekV2ForCausalLM(hf_cfg).eval()

    tokens = [3, 17, 99, 4, 4, 127, 56, 23, 8, 1, 77, 12]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, num_layers=3, num_heads=4,
        q_lora_rank=q_lora, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=32, intermediate_size=64,
        first_k_dense_replace=1, routed_scaling_factor=1.5,
        max_position=128, rope_theta=10000.0, dtype=jnp.float32,
        moe_capacity_factor=100.0,  # no drops: exact vs HF (no capacity)
    )
    params = deepseek_params_from_hf(model.state_dict(), cfg)
    t = len(tokens)
    cache = init_deepseek_kv_cache(cfg, 4, 16, dtype=jnp.float32)
    bt = jnp.arange(4, dtype=jnp.int32)[None, :]
    positions = jnp.arange(t, dtype=jnp.int32)
    cu = jnp.asarray([0, t], jnp.int32)
    logits, _, _ = deepseek_verify_forward(
        params, cfg, jnp.asarray(tokens, jnp.int32), positions, cu, t,
        jnp.asarray([t], jnp.int32), bt, positions, cache, jnp.zeros((0,), jnp.float32),
    )
    ours = np.asarray(logits)

    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours - ours.mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))


def test_deepseek_v3_conversion_matches_transformers():
    """DeepSeek-V3: same MLA, sigmoid noaux_tc gate (group top-2-sum
    choice with correction bias, unbiased weights, normalized, scaled)."""
    from transformers.models.deepseek_v3 import DeepseekV3Config as HFV3Config
    from transformers.models.deepseek_v3 import DeepseekV3ForCausalLM

    from conch_tpu.models.deepseek import (
        DeepseekV2Config,
        deepseek_verify_forward,
        init_deepseek_kv_cache,
    )
    from conch_tpu.models.hf import deepseek_params_from_hf

    hf_cfg = HFV3Config(
        vocab_size=128, hidden_size=64, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=3,
        moe_intermediate_size=32, intermediate_size=64,
        first_k_dense_replace=1, routed_scaling_factor=2.5,
        norm_topk_prob=True, n_group=4, topk_group=2,
        max_position_embeddings=128, rope_theta=10000.0,
        rope_interleave=True, tie_word_embeddings=False, attention_bias=False,
        rope_scaling=None,
    )
    torch.manual_seed(11)
    model = DeepseekV3ForCausalLM(hf_cfg).eval()
    # give the correction bias a non-trivial value so the test covers it
    with torch.no_grad():
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)

    tokens = [3, 17, 99, 4, 4, 127, 56, 23, 8, 1, 77, 12]
    with torch.no_grad():
        hf_logits = model(torch.tensor([tokens])).logits[0].float().numpy()

    cfg = DeepseekV2Config(
        vocab_size=128, hidden_size=64, num_layers=3, num_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=3,
        moe_intermediate_size=32, intermediate_size=64,
        first_k_dense_replace=1, routed_scaling_factor=2.5,
        norm_topk_prob=True, topk_method="noaux_tc", score_function="sigmoid",
        n_group=4, topk_group=2, max_position=128, rope_theta=10000.0,
        dtype=jnp.float32, moe_capacity_factor=100.0,
    )
    params = deepseek_params_from_hf(model.state_dict(), cfg)
    t = len(tokens)
    cache = init_deepseek_kv_cache(cfg, 4, 16, dtype=jnp.float32)
    positions = jnp.arange(t, dtype=jnp.int32)
    logits, _, _ = deepseek_verify_forward(
        params, cfg, jnp.asarray(tokens, jnp.int32), positions,
        jnp.asarray([0, t], jnp.int32), t, jnp.asarray([t], jnp.int32),
        jnp.arange(4, dtype=jnp.int32)[None, :], positions,
        cache, jnp.zeros((0,), jnp.float32),
    )
    ours = np.asarray(logits)

    hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
    our_n = ours - ours.mean(-1, keepdims=True)
    cos = (hf_n * our_n).sum(-1) / (
        np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
    )
    assert cos.min() > 0.999, cos
    np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))


def test_deepseek_yarn_matches_transformers():
    """Real-checkpoint rope: YaRN NTK-by-parts freqs + attention factor
    (V2) and additionally mscale^2 on the softmax scale (V3)."""
    from transformers.models.deepseek_v2 import DeepseekV2Config as HFV2
    from transformers.models.deepseek_v2 import DeepseekV2ForCausalLM
    from transformers.models.deepseek_v3 import DeepseekV3Config as HFV3
    from transformers.models.deepseek_v3 import DeepseekV3ForCausalLM

    from conch_tpu.models.deepseek import (
        DeepseekV2Config,
        deepseek_verify_forward,
        init_deepseek_kv_cache,
    )
    from conch_tpu.models.hf import deepseek_params_from_hf

    yarn = {
        "rope_type": "yarn", "factor": 8.0, "beta_fast": 32, "beta_slow": 1,
        "mscale": 0.707, "mscale_all_dim": 0.6,
        "original_max_position_embeddings": 32,
    }
    tokens = [3, 17, 99, 4, 4, 127, 56, 23, 8, 1, 77, 12]
    common_hf = dict(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32, head_dim=16,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=32, intermediate_size=64,
        first_k_dense_replace=1, max_position_embeddings=256,
        rope_theta=10000.0, tie_word_embeddings=False, attention_bias=False,
    )
    common_ours = dict(
        vocab_size=128, hidden_size=64, num_layers=2, num_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=32, intermediate_size=64,
        first_k_dense_replace=1, max_position=256, rope_theta=10000.0,
        dtype=jnp.float32, moe_capacity_factor=100.0,
        rope_scaling=tuple(yarn.items()),
    )

    def run_ours(cfg, state):
        params = deepseek_params_from_hf(state, cfg)
        t = len(tokens)
        cache = init_deepseek_kv_cache(cfg, 4, 16, dtype=jnp.float32)
        positions = jnp.arange(t, dtype=jnp.int32)
        logits, _, _ = deepseek_verify_forward(
            params, cfg, jnp.asarray(tokens, jnp.int32), positions,
            jnp.asarray([0, t], jnp.int32), t, jnp.asarray([t], jnp.int32),
            jnp.arange(4, dtype=jnp.int32)[None, :], positions,
            cache, jnp.zeros((0,), jnp.float32),
        )
        return np.asarray(logits)

    def compare(hf_logits, ours):
        hf_n = hf_logits - hf_logits.mean(-1, keepdims=True)
        our_n = ours - ours.mean(-1, keepdims=True)
        cos = (hf_n * our_n).sum(-1) / (
            np.linalg.norm(hf_n, axis=-1) * np.linalg.norm(our_n, axis=-1)
        )
        assert cos.min() > 0.999, cos
        np.testing.assert_array_equal(our_n.argmax(-1), hf_n.argmax(-1))

    # V2 + yarn
    torch.manual_seed(21)
    m2 = DeepseekV2ForCausalLM(
        HFV2(**common_hf, routed_scaling_factor=1.0, norm_topk_prob=False,
             topk_method="greedy", rope_scaling=dict(yarn))
    ).eval()
    with torch.no_grad():
        hf2 = m2(torch.tensor([tokens])).logits[0].float().numpy()
    cfg2 = DeepseekV2Config(**common_ours)
    compare(hf2, run_ours(cfg2, m2.state_dict()))

    # V3 + yarn (+ mscale^2 softmax-scale adjustment)
    torch.manual_seed(22)
    m3 = DeepseekV3ForCausalLM(
        HFV3(**common_hf, routed_scaling_factor=1.5, norm_topk_prob=True,
             n_group=2, topk_group=1, rope_interleave=True,
             rope_scaling=dict(yarn))
    ).eval()
    with torch.no_grad():
        hf3 = m3(torch.tensor([tokens])).logits[0].float().numpy()
    cfg3 = DeepseekV2Config(
        **common_ours | dict(
            routed_scaling_factor=1.5, norm_topk_prob=True,
            topk_method="noaux_tc", score_function="sigmoid",
            n_group=2, topk_group=1, yarn_mscale_attention=True,
        )
    )
    compare(hf3, run_ours(cfg3, m3.state_dict()))
