# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Mixed prefill+decode batching: running decodes join the varlen step.

With mixed batching a decoding request streams one token per engine step
even while another request chunk-prefills a long prompt; greedy outputs
are bit-identical to the unmixed scheduler (same per-position compute).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


@pytest.fixture(scope="module")
def model():
    cfg = LlamaConfig.tiny(dtype=jnp.float32)
    return cfg, init_llama_params(0, cfg)


@pytest.fixture
def rng():
    return np.random.default_rng(77)


def _ecfg(**over):
    defaults = dict(
        page_size=16, num_pages=96, max_batch_size=4, max_pages_per_seq=16,
        max_prefill_tokens=32, enable_prefix_caching=False,
    )
    defaults.update(over)
    return EngineConfig(**defaults)


def test_mixed_matches_unmixed_greedy(model, rng):
    cfg, params = model
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (120, 40, 9)]
    sp = SamplingParams(max_tokens=15)
    base = LLMEngine(params, cfg, _ecfg(mixed_batching=False)).generate(prompts, sp)
    mixed = LLMEngine(params, cfg, _ecfg(mixed_batching=True)).generate(prompts, sp)
    assert mixed == base


def test_decode_streams_during_long_prefill(model, rng):
    """A running request must emit tokens while another's long prompt is
    still chunk-prefilling (the unmixed scheduler starves it)."""
    cfg, params = model
    short = list(rng.integers(0, cfg.vocab_size, size=10))
    long = list(rng.integers(0, cfg.vocab_size, size=160))  # 5 chunks of 32

    def run(mixed: bool) -> int:
        eng = LLMEngine(params, cfg, _ecfg(mixed_batching=mixed))
        r_short = eng.add_request(short, SamplingParams(max_tokens=50))
        # admit + fully prefill the short prompt first
        eng.step()
        req = next(r for r in eng.running if r.request_id == r_short)
        assert len(req.output_tokens) == 1
        eng.add_request(long, SamplingParams(max_tokens=4))
        # long prompt needs 5 chunked prefill steps; count short's tokens
        # produced during those steps
        for _ in range(5):
            eng.step()
        return len(req.output_tokens)

    assert run(mixed=False) == 1  # starved: prefill-priority only
    assert run(mixed=True) >= 5  # streamed one token per mixed step


def test_mixed_with_preemption_pressure(model, rng):
    """Mixed batching under a tiny pool: growth-driven preemption of the
    prefilling request must not corrupt the batch."""
    cfg, params = model
    prompts = [list(rng.integers(0, cfg.vocab_size, size=n)) for n in (60, 60)]
    sp = SamplingParams(max_tokens=30)
    base = LLMEngine(
        params, cfg, _ecfg(mixed_batching=False, num_pages=14, max_pages_per_seq=8)
    ).generate(prompts, sp)
    mixed = LLMEngine(
        params, cfg, _ecfg(mixed_batching=True, num_pages=14, max_pages_per_seq=8)
    ).generate(prompts, sp)
    assert mixed == base
