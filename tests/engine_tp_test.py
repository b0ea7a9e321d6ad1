# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tensor/data-parallel serving-engine tests on the 8-device CPU mesh.

The north-star integration (BASELINE.json): the continuous-batching
engine driving the shard_map TP steps, with params/KV sharded over the
mesh — greedy outputs must match the single-device engine exactly-ish
(same math, different reduction orders, so argmax can only differ when
two logits tie; the tiny models here don't tie).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.parallel.distributed import DataParallelEngineGroup, tp_mesh
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=512, dtype=jnp.float32,
    )
    return cfg, init_llama_params(0, cfg, "bf16")


def _ecfg(**overrides):
    defaults = dict(page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8, max_prefill_tokens=64)
    defaults.update(overrides)
    return EngineConfig(**defaults)


def test_engine_tp4_matches_single_device(model):
    cfg, params = model
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7], [50, 60]]
    single = LLMEngine(params, cfg, _ecfg()).generate(prompts, SamplingParams(max_tokens=6))
    tp = LLMEngine(params, cfg, _ecfg(), mesh=tp_mesh(jax.devices()[:4]))
    assert tp.generate(prompts, SamplingParams(max_tokens=6)) == single


def test_engine_tp_int4_weights(model):
    """The north-star config scaled down: int4 weights tensor-sharded."""
    cfg, _ = model
    params4 = init_llama_params(0, cfg, "int4", group_size=32)
    prompts = [[1, 2, 3, 4], [40, 41]]
    single = LLMEngine(params4, cfg, _ecfg()).generate(prompts, SamplingParams(max_tokens=5))
    tp = LLMEngine(params4, cfg, _ecfg(), mesh=tp_mesh(jax.devices()[:4]))
    assert tp.generate(prompts, SamplingParams(max_tokens=5)) == single


def test_engine_tp_speculative(model):
    """Prompt-lookup speculation through the TP verify step, greedy-exact."""
    cfg, params = model
    motif = [5, 6, 7, 8]
    prompts = [motif * 4, motif * 3 + [9]]
    single = LLMEngine(params, cfg, _ecfg()).generate(prompts, SamplingParams(max_tokens=8))
    tp = LLMEngine(
        params, cfg, _ecfg(num_speculative_tokens=3), mesh=tp_mesh(jax.devices()[:4])
    )
    assert tp.generate(prompts, SamplingParams(max_tokens=8)) == single
    assert tp.spec_tokens_drafted > 0


def test_engine_tp_preemption(model):
    """Page starvation + preempt-recompute under TP."""
    cfg, params = model
    prompts = [[3, 1, 4, 1, 5], [2, 7, 1, 8, 2]]
    tight = LLMEngine(
        params, cfg,
        _ecfg(page_size=4, num_pages=6, max_batch_size=2, max_pages_per_seq=8),
        mesh=tp_mesh(jax.devices()[:4]),
    )
    roomy = LLMEngine(params, cfg, _ecfg(page_size=4, num_pages=64, max_batch_size=2))
    assert tight.generate(prompts, SamplingParams(max_tokens=10)) == roomy.generate(
        prompts, SamplingParams(max_tokens=10)
    )


def test_engine_data_parallel_groups(model):
    """dp=2 x tp=4 over 8 devices: two independent engine shards produce
    exactly the single-device results for their routed requests."""
    cfg, params = model
    prompts = [[1, 2, 3], [4, 5, 6, 7], [8, 9], [10, 11, 12, 13, 14], [15]]
    single = LLMEngine(params, cfg, _ecfg()).generate(prompts, SamplingParams(max_tokens=5))
    group = DataParallelEngineGroup(params, cfg, _ecfg(), dp=2, tp=4)
    assert group.generate(prompts, SamplingParams(max_tokens=5)) == single


def test_engine_rejects_data_axis(model):
    cfg, params = model
    from conch_tpu.parallel.mesh import create_mesh

    with pytest.raises(ValueError, match="data=1"):
        LLMEngine(params, cfg, _ecfg(), mesh=create_mesh(data=2, model=4))


def test_engine_tp_gemma(model):
    """TP serving is model-agnostic: Gemma's step fns plug into the mesh
    path (same param names -> same Megatron sharding rules)."""
    from conch_tpu.models.gemma import (
        GemmaConfig,
        gemma_decode_step,
        gemma_prefill,
        gemma_verify_forward,
        init_gemma_params,
    )

    cfg = GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=512, dtype=jnp.float32,
    )
    params = init_gemma_params(0, cfg)
    fns = dict(prefill_fn=gemma_prefill, decode_fn=gemma_decode_step, verify_fn=gemma_verify_forward)
    prompts = [[5, 6, 7, 5, 6, 7, 5, 6], [9, 8, 7, 6]]
    single = LLMEngine(params, cfg, _ecfg(), **fns).generate(prompts, SamplingParams(max_tokens=6))
    tp = LLMEngine(
        params, cfg, _ecfg(num_speculative_tokens=3), mesh=tp_mesh(jax.devices()[:4]), **fns
    )
    assert tp.generate(prompts, SamplingParams(max_tokens=6)) == single
    assert tp.spec_tokens_drafted > 0


def test_engine_tp_qwen2_bias(model):
    """Qwen2-family attention biases shard with the column-parallel heads."""
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=512, dtype=jnp.float32, attention_bias=True,
    )
    params = init_llama_params(3, cfg, "bf16")
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    single = LLMEngine(params, cfg, _ecfg()).generate(prompts, SamplingParams(max_tokens=6))
    tp = LLMEngine(params, cfg, _ecfg(), mesh=tp_mesh(jax.devices()[:4]))
    assert tp.generate(prompts, SamplingParams(max_tokens=6)) == single


def test_engine_tp_gemma_logit_width(model):
    """Tied-embedding (Gemma) TP steps must NOT all-gather logits: each
    chip already holds the full vocab; gathering would emit duplicated
    vocab copies and sampleable out-of-range token ids."""
    import numpy as np

    from conch_tpu.models.gemma import (
        GemmaConfig,
        gemma_decode_step,
        init_gemma_kv_caches,
        init_gemma_params,
    )
    from conch_tpu.parallel.sharding import kv_cache_sharding, shard_llama_params
    from conch_tpu.parallel.tp_inference import make_tp_decode_step

    cfg = GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=512, dtype=jnp.float32,
    )
    params = init_gemma_params(0, cfg)
    mesh = tp_mesh(jax.devices()[:4])
    sharded = shard_llama_params(params, mesh)
    kc, vc = init_gemma_kv_caches(cfg, num_pages=8, page_size=8)
    kc = jax.device_put(kc, kv_cache_sharding(mesh))
    vc = jax.device_put(vc, kv_cache_sharding(mesh))
    step = make_tp_decode_step(mesh, cfg, sharded, decode_fn=gemma_decode_step)
    b = 2
    logits, _, _ = step(
        sharded,
        jnp.asarray([5, 9], jnp.int32), jnp.asarray([0, 0], jnp.int32),
        jnp.asarray([1, 1], jnp.int32),
        jnp.asarray(np.arange(8).reshape(b, 4), jnp.int32),
        jnp.asarray([0, 32], jnp.int32), kc, vc,
    )
    assert logits.shape == (b, cfg.vocab_size)

    # Single-device parity.
    k0, v0 = init_gemma_kv_caches(cfg, num_pages=8, page_size=8)
    ref, _, _ = gemma_decode_step(
        params, cfg,
        jnp.asarray([5, 9], jnp.int32), jnp.asarray([0, 0], jnp.int32),
        jnp.asarray([1, 1], jnp.int32),
        jnp.asarray(np.arange(8).reshape(b, 4), jnp.int32),
        jnp.asarray([0, 32], jnp.int32), k0, v0,
    )
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_engine_tp_multi_step_decode(model):
    """TP multi-step decode (distributed argmax over vocab shards) is
    greedy-exact vs the single-device engine; tied-embedding Gemma too."""
    cfg, params = model
    prompts = [[1, 2, 3, 4, 5], [9, 8, 7]]
    single = LLMEngine(params, cfg, _ecfg()).generate(prompts, SamplingParams(max_tokens=10))
    tp_multi = LLMEngine(
        params, cfg, _ecfg(multi_step_decode=4), mesh=tp_mesh(jax.devices()[:4])
    )
    assert tp_multi.generate(prompts, SamplingParams(max_tokens=10)) == single

    from conch_tpu.models.gemma import (
        GemmaConfig,
        gemma_decode_step,
        gemma_prefill,
        init_gemma_params,
    )

    gcfg = GemmaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=512, dtype=jnp.float32,
    )
    gparams = init_gemma_params(0, gcfg)
    fns = dict(prefill_fn=gemma_prefill, decode_fn=gemma_decode_step)
    gsingle = LLMEngine(gparams, gcfg, _ecfg(), **fns).generate(prompts, SamplingParams(max_tokens=8))
    gtp = LLMEngine(
        gparams, gcfg, _ecfg(multi_step_decode=3), mesh=tp_mesh(jax.devices()[:4]), **fns
    )
    assert gtp.generate(prompts, SamplingParams(max_tokens=8)) == gsingle
