# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Multi-LoRA serving tests.

Three layers of proof:
1. the batched one-hot dispatch (``lora_delta``) equals the per-adapter
   matmul it folds together;
2. the model-level delta path equals merging the adapter into the dense
   weights (single adapter, whole batch);
3. the engine-level multi-adapter batch is *isolated*: every request's
   greedy output equals the same request served alone — different
   adapters (and base-model requests) in one continuous batch never
   bleed into each other, including through the prefix cache and
   speculative decoding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.linear import QuantizedLinear
from conch_tpu.models.llama import LlamaConfig, init_llama_params, llama_prefill
from conch_tpu.models.lora import (
    init_lora_adapter,
    lora_delta,
    lora_selector,
    merge_lora_into_params,
    stack_lora_adapters,
)
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


def _f32_dense(params: dict) -> dict:
    """Rebuild every projection as float32 dense for tight numerics."""
    layers = dict(params["layers"])
    for name, ql in layers.items():
        if isinstance(ql, QuantizedLinear):
            layers[name] = QuantizedLinear.dense(ql.arrays["w"].astype(jnp.float32))
    out = dict(params)
    out["layers"] = layers
    out["lm_head"] = QuantizedLinear.dense(params["lm_head"].arrays["w"].astype(jnp.float32))
    return out


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        max_position=512, dtype=jnp.float32,
    )
    params = _f32_dense(init_llama_params(0, cfg, "bf16"))
    adapters = [
        init_lora_adapter(1, cfg, rank=4, alpha=8.0,
                          targets=("wq", "wk", "wv", "wo"), dtype=jnp.float32),
        init_lora_adapter(2, cfg, rank=8, alpha=16.0,
                          targets=("wq", "wv", "w_gate", "w_down"), dtype=jnp.float32),
    ]
    return cfg, params, adapters, stack_lora_adapters(adapters)


def test_stack_and_delta_math(setup):
    cfg, _, adapters, stacked = setup
    la = stacked["layers"]
    # Union of targets; ranks padded to max(4, 8) = 8.
    assert set(la) == {"wq", "wk", "wv", "wo", "w_gate", "w_down"}
    assert la["wq"]["a"].shape == (cfg.num_layers, 2, cfg.hidden_size, 8)
    # wk only exists in adapter 0 -> adapter 1 rows must be zero.
    assert np.all(np.asarray(la["wk"]["a"][:, 1]) == 0)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(5, cfg.hidden_size)), jnp.float32)
    ids = jnp.asarray([0, 1, -1, 1, 0])
    sel = lora_selector(ids, stacked["scales"])
    got = np.asarray(lora_delta(x, la["wq"]["a"][0], la["wq"]["b"][0], sel))

    for t, aid in enumerate([0, 1, -1, 1, 0]):
        if aid < 0:
            expect = np.zeros(got.shape[-1])
        else:
            ad = adapters[aid]["layers"]["wq"]
            a0 = np.asarray(ad["a"][0], np.float64)
            b0 = np.asarray(ad["b"][0], np.float64)
            expect = (np.asarray(x[t], np.float64) @ a0 @ b0) * adapters[aid]["scale"]
        np.testing.assert_allclose(got[t], expect, rtol=1e-5, atol=1e-5)


def _prefill_logits(cfg, params, prompt, lora=None, lora_ids=None, num_pages=16, ps=16):
    t = len(prompt)
    k = jnp.zeros((cfg.num_layers, num_pages, cfg.num_kv_heads, ps, cfg.head_dim), jnp.float32)
    v = jnp.zeros_like(k)
    n_pages = -(-t // ps)
    bt = jnp.zeros((1, 8), jnp.int32).at[0, :n_pages].set(jnp.arange(n_pages))
    logits, _, _ = llama_prefill(
        params, cfg,
        token_ids=jnp.asarray(prompt, jnp.int32),
        positions=jnp.arange(t, dtype=jnp.int32),
        cu_seqlens_q=jnp.asarray([0, t], jnp.int32),
        max_seqlen_q=max(t, 16),
        seq_lens=jnp.asarray([t], jnp.int32),
        block_tables=bt,
        slot_mapping=jnp.arange(t, dtype=jnp.int32),
        k_caches=k, v_caches=v,
        lora=lora, lora_ids=lora_ids,
    )
    return np.asarray(logits[0])


def test_delta_path_equals_merged_weights(setup):
    cfg, params, adapters, stacked = setup
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, cfg.vocab_size, size=24).tolist()

    for aid in (0, 1):
        with_lora = _prefill_logits(
            cfg, params, prompt, lora=stacked,
            lora_ids=jnp.full((len(prompt),), aid, jnp.int32),
        )
        merged = _prefill_logits(cfg, merge_lora_into_params(params, adapters[aid]), prompt)
        np.testing.assert_allclose(with_lora, merged, rtol=2e-4, atol=2e-4)
        assert np.argmax(with_lora) == np.argmax(merged)

    # id -1 must be exactly the base model.
    base = _prefill_logits(cfg, params, prompt)
    none = _prefill_logits(
        cfg, params, prompt, lora=stacked,
        lora_ids=jnp.full((len(prompt),), -1, jnp.int32),
    )
    np.testing.assert_allclose(none, base, rtol=1e-6, atol=1e-6)


def _serve(cfg, params, stacked, jobs, **ecfg_kw):
    """Run [(prompt, lora_id)] to completion; returns list of outputs."""
    ecfg = EngineConfig(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=64, **ecfg_kw,
    )
    eng = LLMEngine(params, cfg, ecfg, lora=stacked)
    ids = [
        eng.add_request(list(p), SamplingParams(temperature=0.0, max_tokens=8), lora_id=lid)
        for p, lid in jobs
    ]
    done: dict[int, list[int]] = {}
    for _ in range(200):
        for r in eng.step():
            done[r.request_id] = list(r.output_tokens)
        if len(done) == len(ids):
            break
    assert len(done) == len(ids)
    return [done[i] for i in ids]


def test_engine_multi_lora_isolation(setup):
    cfg, params, _, stacked = setup
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).tolist() for n in (21, 17, 25)]
    jobs = list(zip(prompts, [0, 1, None]))

    batched = _serve(cfg, params, stacked, jobs)
    solo = [_serve(cfg, params, stacked, [job])[0] for job in jobs]
    assert batched == solo

    # Adapters really do change the output (the test isn't vacuous).
    alt = _serve(cfg, params, stacked, [(prompts[0], 1)])[0]
    assert alt != batched[0] or _serve(cfg, params, stacked, [(prompts[0], None)])[0] != batched[0]


def test_engine_lora_spec_decode_exact(setup):
    cfg, params, _, stacked = setup
    rng = np.random.default_rng(11)
    # Repetitive prompt so prompt-lookup drafts fire.
    base = rng.integers(0, cfg.vocab_size, size=6).tolist()
    prompt = (base * 4)[:22]
    jobs = [(prompt, 0), (prompt, 1)]

    plain = _serve(cfg, params, stacked, jobs, enable_prefix_caching=False)
    spec = _serve(
        cfg, params, stacked, jobs,
        enable_prefix_caching=False, num_speculative_tokens=3,
    )
    assert plain == spec


def test_prefix_cache_is_adapter_scoped(setup):
    cfg, params, _, stacked = setup
    rng = np.random.default_rng(13)
    prompt = rng.integers(0, cfg.vocab_size, size=33).tolist()  # 2 full pages

    # Same prompt under adapter 0 then adapter 1, sequentially in one
    # engine: the second must NOT reuse the first's cached prefix pages
    # (adapter 0's wk/wv deltas are baked into that KV).
    ecfg = EngineConfig(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=64, enable_prefix_caching=True,
    )
    eng = LLMEngine(params, cfg, ecfg, lora=stacked)
    outs = {}
    r0 = eng.add_request(list(prompt), SamplingParams(temperature=0.0, max_tokens=8), lora_id=0)
    for _ in range(100):
        for r in eng.step():
            outs[r.request_id] = list(r.output_tokens)
        if r0 in outs:
            break
    r1 = eng.add_request(list(prompt), SamplingParams(temperature=0.0, max_tokens=8), lora_id=1)
    for _ in range(100):
        for r in eng.step():
            outs[r.request_id] = list(r.output_tokens)
        if r1 in outs:
            break
    assert eng.prefix_cache_hits == 0  # different adapter -> no reuse

    solo1 = _serve(cfg, params, stacked, [(prompt, 1)])[0]
    assert outs[r1] == solo1

    # Same adapter DOES reuse the cache.
    r2 = eng.add_request(list(prompt), SamplingParams(temperature=0.0, max_tokens=8), lora_id=1)
    for _ in range(100):
        for r in eng.step():
            outs[r.request_id] = list(r.output_tokens)
        if r2 in outs:
            break
    assert eng.prefix_cache_hits > 0
    assert outs[r2] == solo1


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_engine_tp4_lora_matches_single_device(setup):
    """Multi-LoRA under tensor parallelism: adapter stacks shard with the
    Megatron rules (b on N column-parallel, a on K row-parallel; the
    row-parallel delta rides the same psum as the base matmul)."""
    import jax as _jax

    from conch_tpu.parallel.distributed import tp_mesh

    cfg, params, _, stacked = setup
    rng = np.random.default_rng(17)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).tolist() for n in (13, 21, 18)]
    lids = [0, 1, None]
    sp = SamplingParams(temperature=0.0, max_tokens=6)
    ecfg = EngineConfig(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=64,
    )
    single = LLMEngine(params, cfg, ecfg, lora=stacked).generate(prompts, sp, lora_ids=lids)
    tp = LLMEngine(
        params, cfg, ecfg, lora=stacked, mesh=tp_mesh(_jax.devices()[:2])
    ).generate(prompts, sp, lora_ids=lids)
    assert tp == single


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_engine_tp_lora_spec_decode(setup):
    import jax as _jax

    from conch_tpu.parallel.distributed import tp_mesh

    cfg, params, _, stacked = setup
    base = np.random.default_rng(19).integers(0, cfg.vocab_size, size=6).tolist()
    prompts = [(base * 4)[:22]]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    ecfg = EngineConfig(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=64, enable_prefix_caching=False,
        num_speculative_tokens=3,
    )
    single = LLMEngine(params, cfg, ecfg, lora=stacked).generate(prompts, sp, lora_ids=[0])
    tp = LLMEngine(
        params, cfg, ecfg, lora=stacked, mesh=tp_mesh(_jax.devices()[:2])
    ).generate(prompts, sp, lora_ids=[0])
    assert tp == single


def test_engine_lora_multi_step_exact(setup):
    """K-tokens-per-dispatch greedy scan threads per-row adapter ids."""
    cfg, params, _, stacked = setup
    rng = np.random.default_rng(23)
    prompts = [rng.integers(0, cfg.vocab_size, size=n).tolist() for n in (14, 19)]
    jobs = list(zip(prompts, [0, 1]))
    plain = _serve(cfg, params, stacked, jobs)
    multi = _serve(cfg, params, stacked, jobs, multi_step_decode=4)
    assert plain == multi


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2 virtual devices")
def test_engine_tp_lora_multi_step(setup):
    import jax as _jax

    from conch_tpu.parallel.distributed import tp_mesh

    cfg, params, _, stacked = setup
    prompts = [np.random.default_rng(29).integers(0, cfg.vocab_size, size=16).tolist()]
    sp = SamplingParams(temperature=0.0, max_tokens=8)
    ecfg = EngineConfig(
        page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
        max_prefill_tokens=64, multi_step_decode=4,
    )
    single = LLMEngine(params, cfg, ecfg, lora=stacked).generate(prompts, sp, lora_ids=[1])
    tp = LLMEngine(
        params, cfg, ecfg, lora=stacked, mesh=tp_mesh(_jax.devices()[:2])
    ).generate(prompts, sp, lora_ids=[1])
    assert tp == single


def test_lora_id_validation(setup):
    cfg, params, _, stacked = setup
    ecfg = EngineConfig(page_size=16, num_pages=32, max_batch_size=2, max_pages_per_seq=4)
    eng = LLMEngine(params, cfg, ecfg, lora=stacked)
    with pytest.raises(ValueError, match="out of range"):
        eng.add_request([1, 2, 3], SamplingParams(), lora_id=2)
    no_lora = LLMEngine(params, cfg, ecfg)
    with pytest.raises(ValueError, match="out of range"):
        no_lora.add_request([1, 2, 3], SamplingParams(), lora_id=0)
