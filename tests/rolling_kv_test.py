# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Rolling-buffer KV cache tests.

A sliding-window model only ever reads the last ``window`` KV positions,
so the engine can cap a sequence's KV memory at a ring of
``cap_pages = ceil((window + max_prefill_tokens)/page_size) + 1`` pages:
position ``p`` lives at ring slot ``p % (cap_pages*page_size)``. These
tests check the kernels read the ring correctly (vs a full linear cache)
and that the engine in rolling mode reproduces the unbounded engine's
outputs exactly while holding at most ``cap_pages`` pages per sequence.

Reference for the rolling-buffer idea: the Mistral sliding-window cache
(no reference-repo counterpart; conch has no serving layer).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.kernels.attention.paged_attention import paged_attention_launcher
from conch_tpu.kernels.attention.varlen_attention import varlen_attention_launcher
from conch_tpu.reference.attention.attention import varlen_attention as golden_varlen


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _dense_kv(rng, batch, lmax, kh, head):
    k = rng.standard_normal((batch, lmax, kh, head), dtype=np.float32)
    v = rng.standard_normal((batch, lmax, kh, head), dtype=np.float32)
    return k, v


def _linear_cache(k_dense, v_dense, seq_lens, page_size, rng):
    """Pack dense per-sequence K/V into a linear paged cache with a
    shuffled page assignment (non-trivial block tables)."""
    batch, _, kh, head = k_dense.shape
    pages_per_seq = [-(-s // page_size) for s in seq_lens]
    total = sum(pages_per_seq) + 4
    perm = rng.permutation(total)
    kc = np.zeros((total, kh, page_size, head), dtype=np.float32)
    vc = np.zeros_like(kc)
    max_pages = max(pages_per_seq)
    bt = np.zeros((batch, max_pages), dtype=np.int32)
    nxt = 0
    for b, s in enumerate(seq_lens):
        for pg in range(pages_per_seq[b]):
            page = int(perm[nxt])
            nxt += 1
            bt[b, pg] = page
            lo, hi = pg * page_size, min((pg + 1) * page_size, s)
            kc[page, :, : hi - lo] = k_dense[b, lo:hi].transpose(1, 0, 2)
            vc[page, :, : hi - lo] = v_dense[b, lo:hi].transpose(1, 0, 2)
    return kc, vc, bt


def _ring_cache(k_dense, v_dense, seq_lens, page_size, ring_pages, rng, table_width):
    """Pack dense K/V into per-sequence ring buffers: position p goes to
    ring slot p % (ring_pages*page_size); later positions overwrite."""
    batch, _, kh, head = k_dense.shape
    total = batch * ring_pages + 4
    perm = rng.permutation(total)
    kc = np.zeros((total, kh, page_size, head), dtype=np.float32)
    vc = np.zeros_like(kc)
    bt = np.zeros((batch, table_width), dtype=np.int32)
    cap = ring_pages * page_size
    nxt = 0
    for b, s in enumerate(seq_lens):
        pages = [int(perm[nxt + j]) for j in range(ring_pages)]
        nxt += ring_pages
        bt[b, :ring_pages] = pages
        for p in range(s):  # ascending: later positions overwrite
            slot = p % cap
            kc[pages[slot // page_size], :, slot % page_size] = k_dense[b, p]
            vc[pages[slot // page_size], :, slot % page_size] = v_dense[b, p]
    return kc, vc, bt


def _queries(rng, q_lens, qh, head):
    total = sum(q_lens)
    q = rng.standard_normal((total, qh, head), dtype=np.float32)
    cu = np.zeros(len(q_lens) + 1, dtype=np.int32)
    cu[1:] = np.cumsum(q_lens)
    return q, cu


@pytest.mark.parametrize("head", [128, 64])
def test_paged_decode_ring_matches_linear(rng, head):
    """Decode over a ring cache == decode over the full linear cache.

    head 128 exercises the manual-DMA all-heads kernel; head 64 the
    varlen BlockSpec fallback.
    """
    page_size, window = 16, 40
    ring_pages = -(-window // page_size) + 1  # decode slack: 1 token
    seq_lens = [200, 73, 41]
    kh, group = 2, 2
    k_dense, v_dense = _dense_kv(rng, 3, max(seq_lens), kh, head)
    q, _ = _queries(rng, [1, 1, 1], kh * group, head)
    scale = 1 / math.sqrt(head)

    kc, vc, bt = _linear_cache(k_dense, v_dense, seq_lens, page_size, rng)
    expected = paged_attention_launcher(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(bt),
        jnp.asarray(seq_lens, jnp.int32), scale=scale, window_size=window,
    )

    rkc, rvc, rbt = _ring_cache(
        k_dense, v_dense, seq_lens, page_size, ring_pages, rng, table_width=bt.shape[1]
    )
    got = paged_attention_launcher(
        jnp.asarray(q), jnp.asarray(rkc), jnp.asarray(rvc), jnp.asarray(rbt),
        jnp.asarray(seq_lens, jnp.int32), scale=scale, window_size=window,
        ring_pages=ring_pages,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("head", [128, 64])
def test_varlen_prefill_ring_matches_golden(rng, head):
    """Chunked prefill (multi-token queries) over a ring == the dense
    windowed oracle on the full cache. The ring must cover window +
    the query chunk (in-flight writes)."""
    page_size, window = 16, 40
    q_lens = [24, 8, 1]
    ring_pages = -(-(window + max(q_lens)) // page_size) + 1
    seq_lens = [220, 95, 60]
    kh, group = 2, 2
    k_dense, v_dense = _dense_kv(rng, 3, max(seq_lens), kh, head)
    q, cu = _queries(rng, q_lens, kh * group, head)
    scale = 1 / math.sqrt(head)

    kc, vc, bt = _linear_cache(k_dense, v_dense, seq_lens, page_size, rng)
    expected = golden_varlen(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc), jnp.asarray(cu),
        jnp.asarray(seq_lens, jnp.int32), jnp.asarray(bt), scale, True,
        window_size=window,
    )

    rkc, rvc, rbt = _ring_cache(
        k_dense, v_dense, seq_lens, page_size, ring_pages, rng, table_width=bt.shape[1]
    )
    got = varlen_attention_launcher(
        jnp.asarray(q), jnp.asarray(rkc), jnp.asarray(rvc), jnp.asarray(cu),
        max(q_lens), jnp.asarray(seq_lens, jnp.int32), jnp.asarray(rbt),
        scale=scale, causal=True, window_size=window, ring_pages=ring_pages,
        chunk_tokens=64, q_chunk_rows=16,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-3, rtol=2e-3)


def _mistral_tiny():
    from conch_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = LlamaConfig.tiny(sliding_window=48, dtype=jnp.float32)
    params = init_llama_params(0, cfg)
    return cfg, params


def _engine(cfg, params, rolling: bool, **over):
    from conch_tpu.serving import EngineConfig, LLMEngine

    ecfg = EngineConfig(
        page_size=16,
        num_pages=over.pop("num_pages", 128),
        max_batch_size=4,
        max_pages_per_seq=over.pop("max_pages_per_seq", 16),
        max_prefill_tokens=32,
        rolling_kv=rolling,
        enable_prefix_caching=False,
        **over,
    )
    return LLMEngine(params, cfg, ecfg)


@pytest.mark.parametrize("mode", ["plain", "multi_step", "spec"])
def test_rolling_engine_matches_unbounded(rng, mode):
    """Rolling-KV engine output == unbounded-cache engine output, exactly,
    across plain decode, multi-step decode, and speculative decoding."""
    from conch_tpu.serving import SamplingParams

    cfg, params = _mistral_tiny()
    over = {}
    if mode == "multi_step":
        over["multi_step_decode"] = 4
    if mode == "spec":
        over["num_speculative_tokens"] = 3
    prompts = [
        list(rng.integers(0, cfg.vocab_size, size=n)) for n in (70, 100, 17)
    ]
    sampling = SamplingParams(max_tokens=40)

    base = _engine(cfg, params, rolling=False, **over).generate(prompts, sampling)
    rolled = _engine(cfg, params, rolling=True, **over).generate(prompts, sampling)
    assert rolled == base


def test_rolling_serves_beyond_pool(rng):
    """A sequence whose full KV could NEVER fit the pool (prompt+output =
    200 tokens = 13 linear pages > 8-page pool) serves fine under rolling
    (ring of 6 pages) and matches a big-pool unbounded engine exactly."""
    from conch_tpu.serving import SamplingParams

    cfg, params = _mistral_tiny()
    prompt = list(rng.integers(0, cfg.vocab_size, size=150))
    sampling = SamplingParams(max_tokens=50)

    base = _engine(cfg, params, rolling=False, num_pages=128).generate([prompt], sampling)
    small = _engine(cfg, params, rolling=True, num_pages=8, max_pages_per_seq=8)
    assert small._page_cap == 6
    rolled = small.generate([prompt], sampling)
    assert rolled == base
    # the ring never grew past its cap
    assert small.allocator.num_free == 8


def test_rolling_requires_window_model():
    from conch_tpu.models.llama import LlamaConfig, init_llama_params

    cfg = LlamaConfig.tiny()  # no sliding window
    params = init_llama_params(0, cfg)
    with pytest.raises(ValueError, match="sliding_window"):
        _engine(cfg, params, rolling=True)


def test_ring_requires_window():
    q = jnp.zeros((1, 2, 128))
    kc = jnp.zeros((4, 2, 16, 128))
    bt = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(ValueError, match="window"):
        paged_attention_launcher(
            q, kc, kc, bt, jnp.ones(1, jnp.int32), scale=1.0, ring_pages=4
        )
