# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Parallel sampling (SamplingParams.n > 1): n completions per prompt.

The engine prefills the prompt once and forks n sequences sharing the
prompt's KV pages copy-on-read; only the partial tail page is copied per
sibling. Correctness oracles:

- greedy: all n completions must be bit-identical to the n=1 output
  (any fork corruption — a sibling writing into a shared page, a stale
  partial-page copy — would diverge them);
- stochastic: each sibling's recorded per-token logprobs are replayed
  against the naive dense transformer on that sibling's own token
  history (verifies the forked KV holds exactly the right content on
  every divergent path);
- the page pool drains to empty after all groups finish (no leaked
  refcounts from forked pages).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from engine_test import naive_forward

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    return cfg, init_llama_params(0, cfg)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def _ecfg(**over):
    defaults = dict(
        page_size=16, num_pages=96, max_batch_size=8, max_pages_per_seq=8,
        max_prefill_tokens=64, enable_prefix_caching=False,
    )
    defaults.update(over)
    return EngineConfig(**defaults)


@pytest.mark.parametrize(
    "over",
    [{}, {"multi_step_decode": 3}, {"num_speculative_tokens": 3}],
    ids=["plain", "multi_step", "spec"],
)
def test_greedy_n_matches_single(model, rng, over):
    cfg, params = model
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (37, 20)]

    single = LLMEngine(params, cfg, _ecfg()).generate(
        prompts, SamplingParams(max_tokens=12)
    )
    eng = LLMEngine(params, cfg, _ecfg(**over))
    grouped = eng.generate(prompts, SamplingParams(max_tokens=12, n=3))
    for outs, ref in zip(grouped, single):
        assert len(outs) == 3
        for out in outs:
            assert out == ref
    assert eng.allocator.num_free == 96  # all forked refs released


def test_stochastic_siblings_diverge_and_replay_exactly(model, rng):
    """Sampled siblings take different paths; every path's logprobs must
    replay exactly on the dense oracle (the forked KV is correct)."""
    cfg, params = model
    prompt = list(rng.integers(0, cfg.vocab_size, size=30))
    eng = LLMEngine(params, cfg, _ecfg(seed=3))
    rid = eng.add_request(
        prompt, SamplingParams(max_tokens=8, n=4, temperature=1.0, logprobs=True)
    )
    finished = []
    while eng.waiting or eng.running:
        finished.extend(eng.step())
    by_id = {r.request_id: r for r in finished}
    group = [by_id[i] for i in (rid, *eng._group[rid])]
    outs = [r.output_tokens for r in group]
    assert len(outs) == 4
    assert len({tuple(o) for o in outs}) > 1, "temperature=1 siblings all identical"

    for r in group:
        assert len(r.output_logprobs) == len(r.output_tokens)
        hist = list(prompt)
        for tok, lp in zip(r.output_tokens, r.output_logprobs):
            logits = naive_forward(params, cfg, np.asarray(hist))
            expect = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32))[tok]
            np.testing.assert_allclose(lp, float(expect), atol=2e-3, rtol=2e-3)
            hist.append(tok)


def test_batch_full_falls_back_to_recompute(model, rng):
    """With max_batch_size=2, a 4-way group cannot all fork into the
    running batch; overflow siblings recompute via the waiting queue and
    still produce the same greedy output."""
    cfg, params = model
    prompt = list(rng.integers(0, cfg.vocab_size, size=25))
    single = LLMEngine(params, cfg, _ecfg()).generate(
        [prompt], SamplingParams(max_tokens=10)
    )[0]
    eng = LLMEngine(params, cfg, _ecfg(max_batch_size=2))
    (outs,) = eng.generate([prompt], SamplingParams(max_tokens=10, n=4))
    assert len(outs) == 4
    for out in outs:
        assert out == single
    assert eng.allocator.num_free == 96


def test_parallel_sampling_with_prefix_caching(model, rng):
    """Forked full pages may themselves be prefix-cache shared; refcounts
    must survive the double sharing."""
    cfg, params = model
    prompt = list(rng.integers(0, cfg.vocab_size, size=40))
    single = LLMEngine(params, cfg, _ecfg()).generate(
        [prompt], SamplingParams(max_tokens=6)
    )[0]
    eng = LLMEngine(params, cfg, _ecfg(enable_prefix_caching=True))
    grouped = eng.generate([prompt, prompt], SamplingParams(max_tokens=6, n=2))
    for outs in grouped:
        for out in outs:
            assert out == single
    # free + cache-held pages account for the whole pool
    assert eng.allocator.num_free + len(eng._cached_lru) == 96


def test_rolling_kv_group_recomputes(rng):
    """Rolling-KV mode cannot share ring pages; siblings recompute and
    still match (greedy)."""
    cfg = LlamaConfig.tiny(sliding_window=48, dtype=jnp.float32)
    params = init_llama_params(0, cfg)
    prompt = list(rng.integers(0, cfg.vocab_size, size=60))
    single = LLMEngine(params, cfg, _ecfg()).generate(
        [prompt], SamplingParams(max_tokens=10)
    )[0]
    eng = LLMEngine(params, cfg, _ecfg(rolling_kv=True, max_prefill_tokens=32))
    (outs,) = eng.generate([prompt], SamplingParams(max_tokens=10, n=2))
    assert outs == [single, single]


def test_abort_parent_aborts_group(model, rng):
    cfg, params = model
    prompt = list(rng.integers(0, cfg.vocab_size, size=20))
    eng = LLMEngine(params, cfg, _ecfg())
    rid = eng.add_request(prompt, SamplingParams(max_tokens=50, n=3))
    for _ in range(4):
        eng.step()
    assert len(eng.running) == 3  # parent + 2 siblings decoding
    assert eng.abort_request(rid)
    assert not eng.running and not eng.waiting
    assert eng.allocator.num_free == 96
