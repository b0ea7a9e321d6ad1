# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tensor-parallel DeepSeek-V2 (MLA) on the virtual device mesh.

MLA TP layout: heads shard over "model" (wq/q_b column-parallel, the
absorbed W_uk/W_uv shard their head axis, wo row-parallel), the latent
cache is replicated per chip (MQA-shared and tiny), routed experts shard
the expert axis, shared experts are column/row-parallel. Attention needs
zero cross-chip communication; each layer reduces with two psums.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from conch_tpu.models.deepseek import (
    DeepseekV2Config,
    deepseek_decode_step,
    deepseek_prefill,
    deepseek_verify_forward,
    init_deepseek_kv_cache,
    init_deepseek_params,
)
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


def _mesh(tp: int) -> Mesh:
    devs = np.asarray(jax.devices()[:tp]).reshape(1, tp)
    return Mesh(devs, ("data", "model"))


@pytest.fixture(scope="module")
def model():
    cfg = DeepseekV2Config(
        vocab_size=256, hidden_size=64, num_layers=3, num_heads=4,
        q_lora_rank=24, kv_lora_rank=32, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32,
        n_routed_experts=4, n_shared_experts=1, num_experts_per_tok=2,
        moe_intermediate_size=32, intermediate_size=64, first_k_dense_replace=1,
        dtype=jnp.float32, moe_capacity_factor=100.0,
    )
    return cfg, init_deepseek_params(0, cfg)


@pytest.mark.parametrize("tp", [2, 4])
def test_tp_decode_matches_single_device(model, tp):
    from jax.sharding import PartitionSpec as P

    from conch_tpu.parallel.tp_inference import make_tp_decode_step

    cfg, params = model
    rng = np.random.default_rng(0)
    batch, pages, ps = 2, 8, 16
    cache = init_deepseek_kv_cache(cfg, pages, ps, dtype=jnp.float32)
    vdummy = jnp.zeros((0,), jnp.float32)
    # Pre-populate a short history via single-device prefill.
    hist = [list(rng.integers(0, cfg.vocab_size, size=9)) for _ in range(batch)]
    bt = jnp.asarray([[0, 1, 0, 0], [2, 3, 0, 0]], jnp.int32)
    tokens = jnp.asarray([h for hh in hist for h in hh], jnp.int32)
    positions = jnp.asarray(list(range(9)) * batch, jnp.int32)
    slots = jnp.asarray(
        [int(bt[b, p // ps]) * ps + p % ps for b in range(batch) for p in range(9)], jnp.int32
    )
    cu = jnp.asarray([0, 9, 18], jnp.int32)
    _, cache, _ = deepseek_prefill(
        params, cfg, tokens, positions, cu, 9, jnp.asarray([9, 9], jnp.int32),
        bt, slots, cache, vdummy,
    )

    dec_tokens = jnp.asarray([5, 7], jnp.int32)
    dec_pos = jnp.asarray([9, 9], jnp.int32)
    dec_slots = jnp.asarray([int(bt[b, 0]) * ps + 9 for b in range(batch)], jnp.int32)
    seq_lens = jnp.asarray([10, 10], jnp.int32)

    ref_logits, ref_cache, _ = deepseek_decode_step(
        params, cfg, dec_tokens, dec_pos, seq_lens, bt, dec_slots, cache, vdummy
    )

    mesh = _mesh(tp)
    step = make_tp_decode_step(
        mesh, cfg, params, decode_fn=deepseek_decode_step, kv_specs=(P(), P())
    )
    with mesh:
        tp_logits, tp_cache, _ = step(
            params, dec_tokens, dec_pos, seq_lens, bt, dec_slots, cache, vdummy
        )
    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tp_cache), np.asarray(ref_cache), atol=1e-5, rtol=1e-5)


def test_tp_engine_matches_single_device(model):
    cfg, params = model
    rng = np.random.default_rng(1)
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (30, 11)]
    ecfg = EngineConfig(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=32, enable_prefix_caching=False,
    )
    kw = dict(
        prefill_fn=deepseek_prefill, decode_fn=deepseek_decode_step,
        verify_fn=deepseek_verify_forward,
    )
    single = LLMEngine(params, cfg, ecfg, **kw).generate(
        prompts, SamplingParams(max_tokens=8)
    )
    tp_eng = LLMEngine(params, cfg, ecfg, mesh=_mesh(4), **kw)
    tp_out = tp_eng.generate(prompts, SamplingParams(max_tokens=8))
    assert tp_out == single


def test_tp_engine_multi_step(model):
    cfg, params = model
    rng = np.random.default_rng(2)
    prompts = [list(rng.integers(0, cfg.vocab_size, size=22))]
    ecfg = EngineConfig(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=32, enable_prefix_caching=False, multi_step_decode=3,
    )
    kw = dict(
        prefill_fn=deepseek_prefill, decode_fn=deepseek_decode_step,
        verify_fn=deepseek_verify_forward,
    )
    single = LLMEngine(params, cfg, ecfg, **kw).generate(prompts, SamplingParams(max_tokens=9))
    tp_out = LLMEngine(params, cfg, ecfg, mesh=_mesh(2), **kw).generate(
        prompts, SamplingParams(max_tokens=9)
    )
    assert tp_out == single
