# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Beam search over the paged KV engine (offline API).

Synchronized step-level beam search with copy-on-read page sharing:
beams that continue the same parent share its full KV pages by refcount
(decode never rewrites a full page) and only the partial tail page is
device-copied per extra child — the same forking machinery parallel
sampling uses, applied every step. The prompt prefills once.

Candidate rule (pinned by the oracle test): at each step every live beam
proposes its top ``2*beam_width`` tokens; candidates rank by cumulative
logprob; scanning best-first, an EOS candidate retires the hypothesis
(EOS included in its tokens) and others become live beams until
``beam_width`` live beams exist. Final score =
cum_logprob / len(tokens) ** length_penalty; the top ``beam_width``
hypotheses are returned best-first.

vLLM moved beam search out of its engine core into a wrapper with the
same shape (fork + batched decode); there is no reference counterpart.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class BeamHypothesis:
    tokens: list[int]
    score: float


@dataclass
class _Beam:
    tokens: list[int] = field(default_factory=list)  # generated tokens
    pages: list[int] = field(default_factory=list)
    cum: float = 0.0


def _bucket(n: int, floor: int = 16) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


def _prefill_prompt(engine, prompt: list[int], pages: list[int]) -> np.ndarray:
    """Chunk-prefill ``prompt`` into ``pages``; returns last-token
    log-softmax (vocab,) f64."""
    ecfg = engine.ecfg
    ps = ecfg.page_size
    bpad = ecfg.max_batch_size
    start = 0
    last = None
    while start < len(prompt):
        take = min(ecfg.max_prefill_tokens, len(prompt) - start)
        total_pad = _bucket(take)
        tokens = np.zeros(total_pad, np.int32)
        tokens[:take] = prompt[start : start + take]
        positions = np.zeros(total_pad, np.int32)
        positions[:take] = np.arange(start, start + take)
        slots = np.full(total_pad, -1, np.int32)
        slots[:take] = [pages[p // ps] * ps + p % ps for p in range(start, start + take)]
        cu = np.zeros(bpad + 1, np.int32)
        cu[1:] = take
        sl = np.zeros(bpad, np.int32)
        sl[0] = start + take
        bt = np.zeros((bpad, ecfg.max_pages_per_seq), np.int32)
        bt[0, : len(pages)] = pages
        logits, engine.k_caches, engine.v_caches = engine._prefill_fn(
            engine.params,
            token_ids=jnp.asarray(tokens),
            positions=jnp.asarray(positions),
            cu_seqlens_q=jnp.asarray(cu),
            max_seqlen_q=_bucket(take),
            seq_lens=jnp.asarray(sl),
            block_tables=jnp.asarray(bt),
            slot_mapping=jnp.asarray(slots),
            k_caches=engine.k_caches,
            v_caches=engine.v_caches,
        )
        last = logits[0]
        start += take
    return np.asarray(jax.nn.log_softmax(last.astype(jnp.float32)), np.float64)


def _fork_pages(engine, src_pages: list[int], kv_len: int) -> list[int]:
    """Share full pages by refcount; device-copy the partial tail page."""
    ps = engine.ecfg.page_size
    full = kv_len // ps
    partial = kv_len % ps
    for page in src_pages[:full]:
        engine.allocator.fork(page)
    new_pages = list(src_pages[:full])
    if partial:
        engine._reclaim(1)
        fresh = engine.allocator.allocate()
        engine._copy_page(src_pages[full], fresh)
        new_pages.append(fresh)
    return new_pages


def beam_search(
    engine,
    prompt: list[int],
    beam_width: int,
    max_tokens: int,
    length_penalty: float = 1.0,
    eos_token_id: int | None = None,
) -> list[BeamHypothesis]:
    """Run beam search for one prompt on an idle engine.

    Returns up to ``beam_width`` hypotheses, best-first. The engine's KV
    pool, prefill/decode steps, and page allocator are used directly —
    no requests may be in flight, and rolling-KV engines are unsupported
    (ring pages cannot be shared between beams).
    """
    if engine.running or engine.waiting:
        msg = "beam_search needs an idle engine (offline API)"
        raise ValueError(msg)
    if engine._cap_tokens is not None:
        msg = "beam_search is incompatible with rolling_kv (shared ring pages)"
        raise ValueError(msg)
    ecfg = engine.ecfg
    if beam_width > ecfg.max_batch_size:
        msg = f"beam_width {beam_width} exceeds max_batch_size {ecfg.max_batch_size}"
        raise ValueError(msg)
    ps = ecfg.page_size
    eos = eos_token_id if eos_token_id is not None else ecfg.eos_token_id
    cap_tokens = ecfg.max_pages_per_seq * ps
    if len(prompt) + max_tokens + 1 > cap_tokens:
        msg = f"prompt+max_tokens exceeds the {cap_tokens}-token page cap"
        raise ValueError(msg)

    n_pages = -(-(len(prompt) + 1) // ps)
    engine._reclaim(n_pages)
    prompt_pages = [engine.allocator.allocate() for _ in range(n_pages)]
    logprobs0 = _prefill_prompt(engine, prompt, prompt_pages)

    finished: list[BeamHypothesis] = []

    def hyp_score(cum: float, length: int) -> float:
        return cum / max(length, 1) ** length_penalty

    # Seed beams from the prompt's top tokens (kv covers the prompt).
    order = np.argsort(-logprobs0, kind="stable")[: beam_width + 1]
    beams: list[_Beam] = []
    for tok in order:
        tok = int(tok)
        cum = float(logprobs0[tok])
        if tok == eos:
            finished.append(BeamHypothesis([tok], hyp_score(cum, 1)))
            continue
        if len(beams) == beam_width:
            continue
        pages = (
            list(prompt_pages) if not beams
            else _fork_pages(engine, prompt_pages, len(prompt))
        )
        beams.append(_Beam(tokens=[tok], pages=pages, cum=cum))
    if not beams:  # every seed was EOS
        for page in prompt_pages:
            engine.allocator.free(page)
        return sorted(finished, key=lambda h: -h.score)[:beam_width]

    bpad = ecfg.max_batch_size
    for _ in range(max_tokens - 1):
        # One synchronized decode over the live beams (writes each beam's
        # last token into its own partial page).
        tokens = np.zeros(bpad, np.int32)
        positions = np.zeros(bpad, np.int32)
        seq_lens = np.zeros(bpad, np.int32)
        slots = np.full(bpad, -1, np.int32)
        bt = np.zeros((bpad, ecfg.max_pages_per_seq), np.int32)
        for i, b in enumerate(beams):
            pos = len(prompt) + len(b.tokens) - 1
            if pos // ps >= len(b.pages):
                engine._reclaim(1)
                b.pages.append(engine.allocator.allocate())
            tokens[i] = b.tokens[-1]
            positions[i] = pos
            seq_lens[i] = pos + 1
            slots[i] = b.pages[pos // ps] * ps + pos % ps
            bt[i, : len(b.pages)] = b.pages
        logits, engine.k_caches, engine.v_caches = engine._decode_fn(
            engine.params,
            token_ids=jnp.asarray(tokens),
            positions=jnp.asarray(positions),
            seq_lens=jnp.asarray(seq_lens),
            block_tables=jnp.asarray(bt),
            slot_mapping=jnp.asarray(slots),
            k_caches=engine.k_caches,
            v_caches=engine.v_caches,
        )
        lp = np.asarray(
            jax.nn.log_softmax(logits[: len(beams)].astype(jnp.float32), axis=-1),
            np.float64,
        )

        # Rank (beam, token) candidates by cumulative logprob.
        k = min(2 * beam_width, lp.shape[-1])
        cand = []
        for i, b in enumerate(beams):
            top = np.argsort(-lp[i], kind="stable")[:k]
            cand.extend((b.cum + float(lp[i, t]), i, int(t)) for t in top)
        cand.sort(key=lambda c: -c[0])

        new_live: list[tuple[float, int, int]] = []
        for cum, i, tok in cand:
            if tok == eos:
                finished.append(
                    BeamHypothesis(beams[i].tokens + [tok], hyp_score(cum, len(beams[i].tokens) + 1))
                )
                continue
            if len(new_live) < beam_width:
                new_live.append((cum, i, tok))
        # Reassign pages: first child inherits, extras fork, childless free.
        children_of: dict[int, int] = {}
        next_beams = []
        for cum, i, tok in new_live:
            parent = beams[i]
            kv_len = len(prompt) + len(parent.tokens)  # incl. this step's write
            if children_of.get(i, 0) == 0:
                pages = list(parent.pages)
            else:
                pages = _fork_pages(engine, parent.pages, kv_len)
            children_of[i] = children_of.get(i, 0) + 1
            next_beams.append(_Beam(tokens=parent.tokens + [tok], pages=pages, cum=cum))
        for i, b in enumerate(beams):
            if children_of.get(i, 0) == 0:
                for page in b.pages:
                    engine.allocator.free(page)
        beams = next_beams
        if not beams:
            break

    for b in beams:
        finished.append(BeamHypothesis(list(b.tokens), hyp_score(b.cum, len(b.tokens))))
        for page in b.pages:
            engine.allocator.free(page)
    return sorted(finished, key=lambda h: -h.score)[:beam_width]
