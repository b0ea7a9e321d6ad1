# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""End-to-end tests for the continuous-batching serving engine.

The strongest correctness check in the suite: greedy generation through
the full paged-KV serving stack (chunked prefill, paged attention, cache
scatter, scanned layers) must exactly reproduce a naive full-context
transformer evaluated with plain dense jnp attention on the same weights.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.reference.embedding.rotary_embedding import rotary_embedding as rope_ref
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


def naive_forward(params, cfg: LlamaConfig, token_ids: np.ndarray) -> np.ndarray:
    """Full-context forward with dense attention; returns last-token logits."""
    t = len(token_ids)
    hidden = np.asarray(jnp.take(params["embedding"], jnp.asarray(token_ids), axis=0), np.float32)
    positions = jnp.arange(t, dtype=jnp.int32)

    def norm(x, w):
        xf = x.astype(np.float32)
        normed = xf * (1.0 / np.sqrt((xf**2).mean(-1, keepdims=True) + cfg.rms_norm_eps))
        return (normed.astype(np.float32) * np.asarray(w, np.float32))

    def layer_slice(tree, i):
        return jax.tree.map(lambda x: x[i], tree)

    for layer_idx in range(cfg.num_layers):
        layer = layer_slice(params["layers"], layer_idx)
        x = jnp.asarray(norm(hidden, layer["input_norm"]), dtype=cfg.dtype)
        q = layer["wq"].apply(x)
        k = layer["wk"].apply(x)
        v = layer["wv"].apply(x)
        q, k = rope_ref(positions, q, k, params["cos_sin_cache"], cfg.head_dim, cfg.head_dim)

        q = np.asarray(q, np.float32).reshape(t, cfg.num_heads, cfg.head_dim)
        k = np.asarray(k, np.float32).reshape(t, cfg.num_kv_heads, cfg.head_dim)
        v = np.asarray(v, np.float32).reshape(t, cfg.num_kv_heads, cfg.head_dim)

        group = cfg.num_heads // cfg.num_kv_heads
        k = np.repeat(k, group, axis=1)
        v = np.repeat(v, group, axis=1)

        s = np.einsum("qhd,khd->hqk", q, k) / np.sqrt(cfg.head_dim)
        mask = np.tril(np.ones((t, t), bool))
        s = np.where(mask[None], s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        attn = np.einsum("hqk,khd->qhd", p, v).reshape(t, -1)

        attn_out = layer["wo"].apply(jnp.asarray(attn, dtype=cfg.dtype))
        hidden = hidden + np.asarray(attn_out, np.float32)

        x = jnp.asarray(norm(hidden, layer["post_attn_norm"]), dtype=cfg.dtype)
        gate = np.asarray(layer["w_gate"].apply(x), np.float32)
        up = np.asarray(layer["w_up"].apply(x), np.float32)
        act = (gate * (1 / (1 + np.exp(-gate)))).astype(np.float32) * up
        down = layer["w_down"].apply(jnp.asarray(act, dtype=cfg.dtype))
        hidden = hidden + np.asarray(down, np.float32)

    final = jnp.asarray(norm(hidden[-1:], params["final_norm"]), dtype=cfg.dtype)
    return np.asarray(params["lm_head"].apply(final), np.float32)[0]


@pytest.fixture(scope="module")
def tiny_model():
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=32,
        max_position=512, dtype=jnp.float32,
    )
    params = init_llama_params(0, cfg, "bf16")
    return cfg, params


def _make_engine(cfg, params, **overrides):
    defaults = dict(page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8, max_prefill_tokens=64)
    defaults.update(overrides)
    return LLMEngine(params, cfg, EngineConfig(**defaults))


def test_engine_matches_naive_greedy(tiny_model):
    """Engine greedy output == token-by-token naive full-context argmax."""
    cfg, params = tiny_model
    engine = _make_engine(cfg, params)

    prompt = [1, 5, 9, 23, 40]
    outputs = engine.generate([prompt], SamplingParams(max_tokens=6))[0]

    seq = list(prompt)
    expected = []
    for _ in range(6):
        logits = naive_forward(params, cfg, np.asarray(seq))
        tok = int(np.argmax(logits))
        expected.append(tok)
        seq.append(tok)

    assert outputs == expected


def test_engine_batch_consistency(tiny_model):
    """Batched serving gives the same result as serving each prompt alone."""
    cfg, params = tiny_model
    prompts = [[1, 2, 3], [50, 60, 70, 80, 90, 100], [7]]

    together = _make_engine(cfg, params).generate(prompts, SamplingParams(max_tokens=5))
    alone = [
        _make_engine(cfg, params).generate([p], SamplingParams(max_tokens=5))[0] for p in prompts
    ]
    assert together == alone


def test_engine_continuous_batching_oversubscribed(tiny_model):
    """More requests than max_batch_size: all must complete via admission."""
    cfg, params = tiny_model
    engine = _make_engine(cfg, params, max_batch_size=2)
    prompts = [[i, i + 1, i + 2] for i in range(1, 6)]
    outputs = engine.generate(prompts, SamplingParams(max_tokens=4))
    assert len(outputs) == 5
    assert all(len(o) == 4 for o in outputs)
    # Same results as unconstrained batching.
    unconstrained = _make_engine(cfg, params).generate(prompts, SamplingParams(max_tokens=4))
    assert outputs == unconstrained


def test_engine_chunked_prefill(tiny_model):
    """A prompt longer than max_prefill_tokens is chunk-prefilled correctly."""
    cfg, params = tiny_model
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, 127, size=40).tolist()

    chunked = _make_engine(cfg, params, max_prefill_tokens=16).generate([prompt], SamplingParams(max_tokens=3))[0]
    whole = _make_engine(cfg, params, max_prefill_tokens=512).generate([prompt], SamplingParams(max_tokens=3))[0]
    assert chunked == whole


def test_engine_page_exhaustion_deferred_admission(tiny_model):
    """When pages run out, requests wait and are admitted later."""
    cfg, params = tiny_model
    engine = _make_engine(cfg, params, num_pages=8, max_batch_size=4)
    prompts = [[1, 2, 3, 4]] * 4
    outputs = engine.generate(prompts, SamplingParams(max_tokens=4))
    assert len(outputs) == 4


def test_engine_int4_quantized(tiny_model):
    """The int4 weight-only path serves tokens end to end."""
    cfg, _ = tiny_model
    params4 = init_llama_params(0, cfg, "int4", group_size=32)
    outputs = _make_engine(cfg, params4).generate([[1, 2, 3, 4, 5]], SamplingParams(max_tokens=4))[0]
    assert len(outputs) == 4
    assert all(0 <= t < cfg.vocab_size for t in outputs)


def test_sampling_temperature_reproducible(tiny_model):
    cfg, params = tiny_model
    sp = SamplingParams(temperature=0.8, top_p=0.9, max_tokens=5)
    a = _make_engine(cfg, params).generate([[1, 2, 3]], sp)[0]
    b = _make_engine(cfg, params).generate([[1, 2, 3]], sp)[0]
    assert a == b  # same engine seed => same sampling


def test_engine_preemption_recompute(tiny_model):
    """A page-starved engine preempts and recomputes, yet greedy outputs
    match the unconstrained engine exactly (recompute-prefill rebuilds the
    same KV state)."""
    cfg, params = tiny_model
    # 6 pages of 4 slots: two growing sequences of 5+12=17 tokens each
    # (5 pages apiece at the end) cannot coexist -> forces preemption.
    tight = _make_engine(
        cfg, params, page_size=4, num_pages=6, max_batch_size=2, max_pages_per_seq=8
    )
    prompts = [[3, 1, 4, 1, 5], [2, 7, 1, 8, 2]]
    outputs = tight.generate(prompts, SamplingParams(max_tokens=12))
    roomy = _make_engine(cfg, params, page_size=4, num_pages=64, max_batch_size=2)
    expected = roomy.generate(prompts, SamplingParams(max_tokens=12))
    assert outputs == expected


def test_engine_preemption_happens(tiny_model):
    """The starved scenario above really exercises the preemption path."""
    cfg, params = tiny_model
    tight = _make_engine(
        cfg, params, page_size=4, num_pages=6, max_batch_size=2, max_pages_per_seq=8
    )
    for p in ([3, 1, 4, 1, 5], [2, 7, 1, 8, 2]):
        tight.add_request(p, SamplingParams(max_tokens=12))
    finished = []
    preemptions = 0
    while tight.waiting or tight.running:
        finished.extend(tight.step())
        preemptions = max(
            preemptions,
            max((r.num_preemptions for r in tight.waiting + tight.running + finished), default=0),
        )
    assert preemptions >= 1, "scenario did not trigger preemption"
    assert all(len(r.output_tokens) == 12 for r in finished)


def test_engine_int8_kv_cache(tiny_model):
    """Engine with an int8 KV cache (quantize-on-store + folded dequant)
    generates deterministically; logits path validated in
    tests/parallel_test.py::test_tp_decode_int8_kv_cache."""
    cfg, params = tiny_model
    import dataclasses

    cfg8 = dataclasses.replace(cfg, kv_cache_scale=0.005)
    engine = LLMEngine(
        params, cfg8,
        EngineConfig(page_size=16, num_pages=64, max_batch_size=2, max_pages_per_seq=8, max_prefill_tokens=64),
        cache_dtype=jnp.int8,
    )
    outs = engine.generate([[1, 5, 9], [7, 2]], SamplingParams(max_tokens=6))
    assert all(len(o) == 6 for o in outs)
    engine2 = LLMEngine(
        params, cfg8,
        EngineConfig(page_size=16, num_pages=64, max_batch_size=2, max_pages_per_seq=8, max_prefill_tokens=64),
        cache_dtype=jnp.int8,
    )
    assert engine2.generate([[1, 5, 9], [7, 2]], SamplingParams(max_tokens=6)) == outs


def test_engine_rejects_impossible_prompt(tiny_model):
    cfg, params = tiny_model
    engine = _make_engine(cfg, params, page_size=4, num_pages=4, max_pages_per_seq=4)
    with pytest.raises(ValueError, match="can never fit"):
        engine.add_request(list(range(20)))


def test_engine_prefix_caching_correct_and_hits(tiny_model):
    """Requests sharing a long prompt prefix reuse cached KV pages; outputs
    are identical to an engine with prefix caching disabled."""
    cfg, params = tiny_model
    rng = np.random.default_rng(11)
    system = rng.integers(0, 127, size=37).tolist()  # spans 2 full 16-slot pages
    prompts = [system + [1, 2, 3], system + [9, 8], system + [5]]

    cached = _make_engine(cfg, params)
    # First request populates the cache; the next two (admitted after its
    # prefill registered the full prefix pages) reuse 2 pages each.
    outs = [cached.generate([prompts[0]], SamplingParams(max_tokens=4))[0]]
    outs += cached.generate(prompts[1:], SamplingParams(max_tokens=4))
    assert cached.prefix_cache_hits >= 2 * 16 * 2

    plain = LLMEngine(
        params, cfg,
        EngineConfig(page_size=16, num_pages=64, max_batch_size=4, max_pages_per_seq=8,
                     max_prefill_tokens=64, enable_prefix_caching=False),
    )
    assert outs == plain.generate(prompts, SamplingParams(max_tokens=4))


def test_engine_prefix_cache_survives_finish(tiny_model):
    """A later, separately-submitted request hits pages cached from an
    already-finished request (LRU retention)."""
    cfg, params = tiny_model
    rng = np.random.default_rng(12)
    system = rng.integers(0, 127, size=32).tolist()

    engine = _make_engine(cfg, params)
    first = engine.generate([system + [4, 4]], SamplingParams(max_tokens=3))[0]
    hits_before = engine.prefix_cache_hits
    second = engine.generate([system + [4, 4]], SamplingParams(max_tokens=3))[0]
    assert engine.prefix_cache_hits > hits_before  # reused the finished request's pages
    assert first == second


def test_engine_prefix_cache_eviction_under_pressure(tiny_model):
    """Cached prefix pages are evicted (not deadlocked on) when the pool
    is needed for new work."""
    cfg, params = tiny_model
    engine = _make_engine(cfg, params, page_size=4, num_pages=8, max_batch_size=1, max_pages_per_seq=8)
    rng = np.random.default_rng(13)
    # Sequential distinct prompts fill and refill the tiny pool; each
    # needs eviction of the previous request's cached pages.
    for i in range(4):
        prompt = rng.integers(0, 127, size=9).tolist()
        out = engine.generate([prompt], SamplingParams(max_tokens=4))[0]
        assert len(out) == 4


def test_engine_speculative_decoding_exact(tiny_model):
    """Prompt-lookup speculative decoding is greedy-exact: identical
    outputs to the regular decode path, with a nonzero acceptance rate on
    a repetitive prompt."""
    cfg, params = tiny_model
    rng = np.random.default_rng(21)
    # Repetitive structure gives the n-gram lookup something to hit.
    motif = rng.integers(0, 127, size=6).tolist()
    prompts = [motif * 4, motif * 3 + [7], rng.integers(0, 127, size=10).tolist()]

    spec = _make_engine(cfg, params, num_speculative_tokens=4)
    spec_out = spec.generate(prompts, SamplingParams(max_tokens=12))
    plain = _make_engine(cfg, params)
    assert spec_out == plain.generate(prompts, SamplingParams(max_tokens=12))
    assert spec.spec_tokens_drafted > 0


def test_engine_speculative_with_preemption(tiny_model):
    """Speculation composes with page starvation / preemption."""
    cfg, params = tiny_model
    motif = [3, 1, 4, 1]
    prompts = [motif * 2, motif * 2 + [9]]
    tight = _make_engine(
        cfg, params, page_size=4, num_pages=7, max_batch_size=2,
        max_pages_per_seq=8, num_speculative_tokens=3,
    )
    outs = tight.generate(prompts, SamplingParams(max_tokens=10))
    roomy = _make_engine(cfg, params, page_size=4, num_pages=64, max_batch_size=2)
    assert outs == roomy.generate(prompts, SamplingParams(max_tokens=10))


def test_engine_prefix_cache_shared_page_eviction_race(tiny_model):
    """Regression: _admit must hold references on the prefix pages it is
    about to share BEFORE evicting LRU cache pages for the same request —
    previously _reclaim could free those very pages and fork() crashed
    (or, with the C++ allocator, silently aliased a reallocated page)."""
    cfg, params = tiny_model
    engine = _make_engine(
        cfg, params, page_size=4, num_pages=6, max_batch_size=1, max_pages_per_seq=5
    )
    rng = np.random.default_rng(17)
    p_prefix = rng.integers(0, 127, size=8).tolist()
    q_prefix = rng.integers(0, 127, size=8).tolist()
    engine.generate([p_prefix], SamplingParams(max_tokens=1))  # caches 2 P-pages (oldest LRU)
    engine.generate([q_prefix], SamplingParams(max_tokens=1))  # caches 2 Q-pages
    # Pool: 4 cached + 2 free. The next prompt shares the 2 P-pages and
    # needs 3 fresh ones, so _reclaim must evict Q-pages, never P-pages.
    long_prompt = p_prefix + rng.integers(0, 127, size=8).tolist()
    out = engine.generate([long_prompt], SamplingParams(max_tokens=2))[0]

    plain = LLMEngine(
        params, cfg,
        EngineConfig(page_size=4, num_pages=64, max_batch_size=1, max_pages_per_seq=5,
                     max_prefill_tokens=64, enable_prefix_caching=False),
    )
    assert out == plain.generate([long_prompt], SamplingParams(max_tokens=2))[0]


def test_engine_per_request_top_k(tiny_model):
    """Regression: SamplingParams.top_k reaches the sampler (it used to be
    silently ignored). top_k=1 with temperature>0 must equal greedy."""
    cfg, params = tiny_model
    prompt = [1, 2, 3, 4]
    greedy = _make_engine(cfg, params).generate([prompt], SamplingParams(max_tokens=6))[0]
    top1 = _make_engine(cfg, params).generate(
        [prompt], SamplingParams(temperature=5.0, top_k=1, max_tokens=6)
    )[0]
    assert top1 == greedy


def test_engine_stop_token_ids(tiny_model):
    """A per-request stop token finishes the request at its first
    occurrence (included in the output, like EOS)."""
    cfg, params = tiny_model
    prompt = [1, 5, 9, 23, 40]
    plain = _make_engine(cfg, params).generate([prompt], SamplingParams(max_tokens=8))[0]
    stop = plain[3]
    out = _make_engine(cfg, params).generate(
        [prompt], SamplingParams(max_tokens=8, stop_token_ids=(stop,))
    )[0]
    first = plain.index(stop)
    assert out == plain[: first + 1]


def test_engine_min_tokens_suppresses_eos(tiny_model):
    """With min_tokens, EOS cannot be sampled before the floor is met."""
    cfg, params = tiny_model
    prompt = [1, 5, 9, 23, 40]
    plain = _make_engine(cfg, params).generate([prompt], SamplingParams(max_tokens=8))[0]
    eos = plain[0]  # greedy would emit EOS immediately
    short = _make_engine(cfg, params, eos_token_id=eos).generate(
        [prompt], SamplingParams(max_tokens=8)
    )[0]
    assert short == [eos]
    out = _make_engine(cfg, params, eos_token_id=eos).generate(
        [prompt], SamplingParams(max_tokens=8, min_tokens=4)
    )[0]
    assert len(out) >= 4
    assert eos not in out[:3]


def test_engine_repetition_penalty_rules():
    """_apply_logit_rules penalizes exactly the seen tokens."""
    from conch_tpu.serving.engine import Request

    cfg = LlamaConfig(
        vocab_size=16, hidden_size=32, intermediate_size=64, num_layers=1,
        num_heads=2, num_kv_heads=1, head_dim=16, max_position=64, dtype=jnp.float32,
    )
    engine = _make_engine(cfg, init_llama_params(0, cfg, "bf16"))
    req = Request(0, prompt=[2, 3], sampling=SamplingParams(repetition_penalty=2.0))
    req.output_tokens = [5]
    logits = jnp.asarray(np.linspace(-1.0, 1.0, 16, dtype=np.float32)[None, :])
    out = np.asarray(engine._apply_logit_rules(logits, [req], rows=[0]))
    base = np.linspace(-1.0, 1.0, 16, dtype=np.float32)
    for tok in range(16):
        if tok in (2, 3, 5):
            exp = base[tok] / 2.0 if base[tok] > 0 else base[tok] * 2.0
        else:
            exp = base[tok]
        np.testing.assert_allclose(out[0, tok], exp, rtol=1e-6)


def test_engine_repetition_penalty_end_to_end(tiny_model):
    """Penalty flows through generate() without disturbing other requests."""
    cfg, params = tiny_model
    prompts = [[1, 5, 9, 23, 40], [7, 8, 9]]
    plain = _make_engine(cfg, params).generate(prompts, SamplingParams(max_tokens=6))
    # Per-request params via add_request directly:
    eng = _make_engine(cfg, params)
    ids = [
        eng.add_request(prompts[0], SamplingParams(max_tokens=6, repetition_penalty=1.5)),
        eng.add_request(prompts[1], SamplingParams(max_tokens=6)),
    ]
    done = {}
    while eng.waiting or eng.running:
        for r in eng.step():
            done[r.request_id] = r.output_tokens
    assert done[ids[1]] == plain[1]  # unpenalized request unchanged
    assert len(done[ids[0]]) == 6


def test_engine_logprobs(tiny_model):
    """logprobs=True records one log-prob per output token, aligned with
    greedy outputs (each greedy logprob is the row max => > others)."""
    cfg, params = tiny_model
    eng = _make_engine(cfg, params)
    rid = eng.add_request([1, 5, 9, 23, 40], SamplingParams(max_tokens=5, logprobs=True))
    done = {}
    while eng.waiting or eng.running:
        for r in eng.step():
            done[r.request_id] = r
    req = done[rid]
    assert len(req.output_logprobs) == len(req.output_tokens) == 5
    assert all(-30.0 < lp <= 0.0 for lp in req.output_logprobs)

    # Unchanged outputs vs a no-logprobs run (observation only).
    plain = _make_engine(cfg, params).generate([[1, 5, 9, 23, 40]], SamplingParams(max_tokens=5))[0]
    assert req.output_tokens == plain


def test_engine_abort_request(tiny_model):
    """Aborting mid-flight frees pages and leaves other requests exact."""
    cfg, params = tiny_model
    solo = _make_engine(cfg, params, enable_prefix_caching=False).generate(
        [[9, 8, 7]], SamplingParams(max_tokens=6)
    )[0]

    eng = _make_engine(cfg, params, enable_prefix_caching=False)
    free0 = eng.allocator.num_free
    victim = eng.add_request([1, 2, 3, 4, 5], SamplingParams(max_tokens=6))
    keeper = eng.add_request([9, 8, 7], SamplingParams(max_tokens=6))
    eng.step()  # prefill both
    assert eng.abort_request(victim)
    assert not eng.abort_request(victim)  # already gone
    done = {}
    while eng.waiting or eng.running:
        for r in eng.step():
            done[r.request_id] = r.output_tokens
    assert victim not in done
    assert done[keeper] == solo
    assert eng.allocator.num_free == free0  # no page leak

    # Aborting a still-waiting request works too.
    eng2 = _make_engine(cfg, params, max_batch_size=1, enable_prefix_caching=False)
    eng2.add_request([1, 2, 3], SamplingParams(max_tokens=2))
    waiting_id = eng2.add_request([4, 5, 6], SamplingParams(max_tokens=2))
    assert eng2.abort_request(waiting_id)
    while eng2.waiting or eng2.running:
        eng2.step()
    assert eng2.allocator.num_free == eng2.ecfg.num_pages


def test_engine_multi_step_decode_exact(tiny_model):
    """K decode steps per dispatch are greedy-exact vs the plain engine,
    including eos mid-window and max_tokens not divisible by K."""
    cfg, params = tiny_model
    prompts = [[1, 5, 9, 23, 40], [9, 8, 7], [50, 60]]
    plain = _make_engine(cfg, params).generate(prompts, SamplingParams(max_tokens=11))
    multi = _make_engine(cfg, params, multi_step_decode=4).generate(
        prompts, SamplingParams(max_tokens=11)
    )
    assert multi == plain

    # EOS lands mid-window: overshoot must be discarded.
    eos = plain[0][5]
    plain_eos = _make_engine(cfg, params, eos_token_id=eos).generate(
        prompts, SamplingParams(max_tokens=11)
    )
    multi_eos = _make_engine(cfg, params, eos_token_id=eos, multi_step_decode=4).generate(
        prompts, SamplingParams(max_tokens=11)
    )
    assert multi_eos == plain_eos


def test_engine_multi_step_decode_under_page_pressure(tiny_model):
    """Multi-step reserves K-1 lookahead slots; preemption-recompute under
    a tiny pool still reproduces the unconstrained outputs."""
    cfg, params = tiny_model
    prompts = [[3, 1, 4, 1, 5], [2, 7, 1, 8, 2]]
    roomy = _make_engine(cfg, params, page_size=4, num_pages=64, max_batch_size=2).generate(
        prompts, SamplingParams(max_tokens=12)
    )
    tight = _make_engine(
        cfg, params, page_size=4, num_pages=6, max_batch_size=2,
        max_pages_per_seq=8, multi_step_decode=3,
    ).generate(prompts, SamplingParams(max_tokens=12))
    assert tight == roomy


def test_engine_multi_step_falls_back_for_sampling(tiny_model):
    """Temperature>0 requests bypass multi-step (argmax feedback is
    greedy-only) — outputs match the plain engine's seeded sampling."""
    cfg, params = tiny_model
    sp = SamplingParams(temperature=0.8, top_p=0.9, max_tokens=6)
    a = _make_engine(cfg, params).generate([[1, 2, 3]], sp)
    b = _make_engine(cfg, params, multi_step_decode=4).generate([[1, 2, 3]], sp)
    assert a == b


def test_engine_multi_step_near_page_cap_terminates(tiny_model):
    """A request within K-1 tokens of its page cap must keep stepping and
    finish at the cap (regression: the lookahead filter livelocked it)."""
    cfg, params = tiny_model
    # Cap = 4 pages x 4 slots = 16 tokens; prompt 13 + unlimited output.
    eng = _make_engine(
        cfg, params, page_size=4, num_pages=32, max_pages_per_seq=4,
        multi_step_decode=3,
    )
    out = eng.generate([[1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13]], SamplingParams(max_tokens=64))[0]
    assert len(out) == 3  # finish-truncated exactly at the 16-token cap
    plain = _make_engine(
        cfg, params, page_size=4, num_pages=32, max_pages_per_seq=4
    ).generate([[1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13]], SamplingParams(max_tokens=64))[0]
    assert out == plain


def test_engine_modes_agree_fuzz(tiny_model):
    """Randomized scenarios: plain, speculative, and multi-step decoding
    must produce identical greedy outputs (they share argmax semantics)."""
    cfg, params = tiny_model
    rng = np.random.default_rng(123)
    for trial in range(4):
        nprompts = int(rng.integers(1, 4))
        prompts = [
            rng.integers(0, cfg.vocab_size, size=int(rng.integers(2, 20))).tolist()
            for _ in range(nprompts)
        ]
        max_tokens = int(rng.integers(3, 14))
        page_size = int(rng.choice([4, 8, 16]))
        base = dict(
            page_size=page_size, num_pages=96, max_batch_size=4,
            max_pages_per_seq=16, max_prefill_tokens=32,
        )
        sp = SamplingParams(max_tokens=max_tokens)
        plain = _make_engine(cfg, params, **base).generate(prompts, sp)
        spec = _make_engine(cfg, params, **base, num_speculative_tokens=3).generate(prompts, sp)
        multi = _make_engine(cfg, params, **base, multi_step_decode=int(rng.choice([2, 3, 5]))).generate(prompts, sp)
        assert plain == spec == multi, f"trial {trial}: modes diverged"


def test_engine_logit_bias_and_stats(tiny_model):
    """logit_bias forces/blocks tokens; stats() reports live counters."""
    cfg, params = tiny_model
    prompt = [1, 5, 9, 23, 40]
    plain = _make_engine(cfg, params).generate([prompt], SamplingParams(max_tokens=4))[0]
    forced = _make_engine(cfg, params).generate(
        [prompt], SamplingParams(max_tokens=4, logit_bias=((7, 1e9),))
    )[0]
    assert forced == [7, 7, 7, 7]
    blocked = _make_engine(cfg, params).generate(
        [prompt], SamplingParams(max_tokens=1, logit_bias=((plain[0], -1e9),))
    )[0]
    assert blocked[0] != plain[0]

    eng = _make_engine(cfg, params)
    eng.add_request(prompt, SamplingParams(max_tokens=2))
    eng.step()
    st = eng.stats()
    assert st["running"] == 1 and st["free_pages"] < st["total_pages"]
