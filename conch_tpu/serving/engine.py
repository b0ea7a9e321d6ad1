# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Continuous-batching LLM serving engine over paged KV caches.

The TPU-native serving layer required by the north star (BASELINE.json):
host-side scheduling (pure Python — admission, chunked prefill, page
allocation) around *shape-stable* jitted device steps, so the decode loop
never recompiles:

- decode: fixed (max_batch,) shapes; idle rows are padded with seq_len 0
  and slot -1 (dropped by the cache scatter, zeroed by the attention
  guard).
- prefill: token counts padded to power-of-two buckets; long prompts are
  *chunk-prefilled* across steps (the reference's varlen kernel supports
  q_len < seq_len for exactly this).
- KV caches are donated through the jitted steps: the cache stack lives
  in one device buffer that XLA updates in place.

Scheduling policy: prefill-priority (one prefill batch when any request
has prompt tokens left, else one decode batch over all running requests),
admission gated on free pages, vLLM-style.
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.models.llama import llama_decode_step, llama_prefill, llama_verify_forward
from conch_tpu.serving.block_allocator import BlockAllocator
from conch_tpu.serving.sampling import SamplingParams, sample_tokens


class RequestState(enum.Enum):
    WAITING = "waiting"
    PREFILLING = "prefilling"
    RUNNING = "running"
    FINISHED = "finished"


@dataclass
class Request:
    request_id: int
    prompt: list[int]
    sampling: SamplingParams
    state: RequestState = RequestState.WAITING
    pages: list[int] = field(default_factory=list)
    num_computed: int = 0  # tokens already prefilled (incl. recompute after preemption)
    output_tokens: list[int] = field(default_factory=list)
    # log P(sampled token) under the rule-adjusted, unscaled logits; only
    # recorded when sampling.logprobs is set. Stays index-aligned with
    # output_tokens (tokens survive preemption; recompute only appends).
    output_logprobs: list[float] = field(default_factory=list)
    num_preemptions: int = 0
    # Parallel sampling (sampling.n > 1): siblings carry the id of the
    # request that prefilled the shared prompt; the parent remembers it
    # already spawned its group (preemption-recompute must not respawn).
    parent_id: int | None = None
    siblings_spawned: bool = False
    # Multi-LoRA serving: index into the engine's stacked adapter set
    # (models/lora.py), -1 = base model. Every device step carries a
    # per-token lora_ids array built from this.
    lora_id: int = -1
    # Guided decoding FSM-state cache: (num output tokens consumed, state).
    # Derived from output_tokens, so preemption recompute and parallel-
    # sampling forks stay correct with no extra bookkeeping.
    guided_cache: tuple[int, int] = (0, 0)

    @property
    def total_len(self) -> int:
        return len(self.prompt) + len(self.output_tokens)

    def token_at(self, pos: int) -> int:
        """Token at absolute position, spanning prompt + generated tokens
        (generated tokens are re-prefilled after a preemption)."""
        if pos < len(self.prompt):
            return self.prompt[pos]
        return self.output_tokens[pos - len(self.prompt)]


@dataclass
class EngineConfig:
    page_size: int = 16
    num_pages: int = 512
    max_batch_size: int = 8
    max_pages_per_seq: int = 64
    max_prefill_tokens: int = 512
    eos_token_id: int | None = None
    seed: int = 0
    # Automatic prefix caching: full prompt pages are registered by their
    # token prefix and shared (refcounted) across requests; finished
    # requests' prefix pages are retained in an LRU pool and evicted only
    # under memory pressure. Page-aligned sharing means shared pages are
    # never written, so no copy-on-write is needed on this path.
    enable_prefix_caching: bool = True
    # Prompt-lookup speculative decoding (greedy-exact, no draft model):
    # draft up to N continuation tokens by matching the trailing n-gram
    # against the sequence's own history, verify them in one batched
    # forward, accept the longest correct prefix + one bonus token.
    # 0 disables. Applies only when every running request is greedy.
    num_speculative_tokens: int = 0
    speculative_ngram: int = 2
    # Mixed batching: schedule running decodes (one token each, taken
    # FIRST from the token budget) into the same varlen step as prefill
    # chunks, so decoding requests keep streaming while long prompts
    # chunk-prefill — no decode stalls, vLLM chunked-prefill style.
    # Decode-only steps still use the fixed-shape decode step. Greedy
    # outputs are unchanged (same per-position computation); stochastic
    # draws come from the same RNG stream in a different order.
    mixed_batching: bool = True
    # Multi-step greedy decode: run K decode iterations inside ONE jitted
    # lax.scan dispatch (token feedback via argmax), then apply eos/stop/
    # max_tokens checks on the host and discard overshoot — KV written
    # past a finish sits beyond the rewound seq_len (masked, overwritten
    # later), the same free-rollback property speculative decoding uses.
    # Big win when per-dispatch host latency dominates (remote/tunneled
    # chips). 1 disables. Applies only when every running request is
    # plain greedy with no pending logit rules. Under TP, greedy
    # selection uses a distributed argmax over the vocab-column shards
    # (two (batch,)-sized all-gathers) instead of gathering full logits.
    # DEFAULT ON (8): a decode-only all-greedy batch advances 8 tokens
    # per dispatch; round-2 hardware measured the engine spending ~10x
    # the model step time on host scheduling + per-step dispatch at
    # default settings. Cost: streaming granularity and finish checks
    # are 8 tokens coarse (overshoot KV is rolled back for free), and up
    # to 7 wasted token-steps on requests that finish mid-scan. Set 1
    # for per-token streaming latency.
    multi_step_decode: int = 8
    # Rolling KV buffer for sliding-window models (Mistral-style): cap
    # each sequence's KV at a ring of
    # ceil((sliding_window + max_prefill_tokens)/page_size) + 1 pages;
    # position p lives at ring slot p % cap_tokens. KV memory becomes
    # O(window) regardless of sequence length, and outputs are
    # bit-identical to the unbounded cache (the window never reads an
    # overwritten slot — the ring covers the window plus the largest
    # in-flight write burst). Requires the model's sliding_window > 0;
    # incompatible with prefix caching (ring pages are rewritten in
    # place, so they cannot be shared between requests).
    rolling_kv: bool = False


def _make_allocator(num_pages: int):
    """Native C++ allocator when built + enabled, else the Python one."""
    from conch_tpu import envs, native

    if envs.CONCH_ENABLE_CPP_EXT and native.is_available():
        return native.NativeBlockAllocator(num_pages)
    return BlockAllocator(num_pages)


def _bucket(n: int, floor: int = 16) -> int:
    b = floor
    while b < n:
        b *= 2
    return b


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _copy_page_jit(k_caches, v_caches, src, dst):
    """Copy page ``src`` -> ``dst`` across all layers of the stacked
    (L, P, KH, ps, D) caches (parallel-sampling partial-page fork)."""
    return (
        k_caches.at[:, dst].set(k_caches[:, src]),
        v_caches.at[:, dst].set(v_caches[:, src]),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _copy_page_k_jit(k_caches, src, dst):
    return k_caches.at[:, dst].set(k_caches[:, src])


class LLMEngine:
    """Continuous-batching engine (model-agnostic scheduler).

    Serves Llama by default; pass ``prefill_fn``/``decode_fn`` (e.g. the
    Gemma forwards from ``conch_tpu.models.gemma``) to serve any model
    family with the (params, config, tokens, ..., caches) step signature.

    Pass ``mesh`` (axes ("data", "model"), data=1) to serve
    tensor-parallel: params are sharded Megatron-style over "model", the
    paged KV pool is sharded on its kv-head dimension (attention then
    needs zero cross-chip communication), and the device steps are the
    ``shard_map`` TP steps from ``conch_tpu.parallel.tp_inference``. The
    host-side scheduler is unchanged — TP is invisible above the step
    functions. Data parallelism runs *outside* the engine: one engine per
    host/device-group (see ``conch_tpu.parallel.distributed``).
    """

    def __init__(
        self,
        params: dict,
        model_config,
        engine_config: EngineConfig,
        cache_dtype=None,
        prefill_fn=None,
        decode_fn=None,
        verify_fn=None,
        mesh=None,
        lora=None,
    ):
        self.params = params
        self.ecfg = engine_config
        # Multi-LoRA: stacked adapter set from models.lora.stack_lora_adapters.
        # Per-request adapter choice rides add_request(lora_id=...); -1 = base.
        # Under TP the adapter stacks shard by the Megatron-consistent LoRA
        # rules (b on N for column-parallel targets, a on K for row-parallel).
        self.lora = lora
        if lora is not None and mesh is not None:
            from conch_tpu.parallel.sharding import shard_lora

            self.lora = shard_lora(lora, mesh)
        # Rolling KV: _page_cap bounds each sequence's page list;
        # _cap_tokens (= _page_cap * page_size) is the ring modulus, or
        # None when rolling is off.
        self._page_cap = engine_config.max_pages_per_seq
        self._cap_tokens: int | None = None
        if engine_config.rolling_kv:
            import dataclasses

            window = getattr(model_config, "sliding_window", 0)
            if window <= 0:
                msg = "rolling_kv requires a model with sliding_window > 0"
                raise ValueError(msg)
            if not hasattr(model_config, "kv_ring_pages"):
                # e.g. Gemma-2: alternating GLOBAL-attention layers need
                # the full history, so a ring can never be valid there.
                msg = (
                    f"{type(model_config).__name__} does not support rolling KV "
                    "(no kv_ring_pages field: every layer must be sliding-window)"
                )
                raise ValueError(msg)
            if engine_config.enable_prefix_caching:
                msg = (
                    "rolling_kv is incompatible with prefix caching (ring pages "
                    "are rewritten in place); set enable_prefix_caching=False"
                )
                raise ValueError(msg)
            ps = engine_config.page_size
            # Ring size: the window plus the largest in-flight write burst
            # (a prefill/verify chunk writes before attention reads), plus
            # one page of alignment slop (tests/rolling_kv_test.py).
            slack = max(
                engine_config.max_prefill_tokens,
                engine_config.num_speculative_tokens + 1,
            )
            cap_pages = -(-(window + slack) // ps) + 1
            if cap_pages > min(engine_config.max_pages_per_seq, engine_config.num_pages):
                msg = (
                    f"rolling_kv needs max_pages_per_seq (and the pool) >= "
                    f"{cap_pages} pages (window {window} + write burst {slack})"
                )
                raise ValueError(msg)
            self._page_cap = cap_pages
            self._cap_tokens = cap_pages * ps
            model_config = dataclasses.replace(model_config, kv_ring_pages=cap_pages)
        self.config = model_config
        self.mesh = mesh
        self.allocator = _make_allocator(engine_config.num_pages)
        dtype = cache_dtype or model_config.dtype
        if getattr(model_config, "kv_cache_layout", "kv") == "mla":
            # MLA (DeepSeek-V2): ONE packed latent cache row per token;
            # v_caches is an empty placeholder threaded through the
            # two-cache step signatures untouched.
            self.k_caches = jnp.zeros(
                (
                    model_config.num_layers,
                    engine_config.num_pages,
                    engine_config.page_size,
                    model_config.kv_packed_dim,
                ),
                dtype=dtype,
            )
            self.v_caches = jnp.zeros((0,), dtype=dtype)
        else:
            cache_shape = (
                model_config.num_layers,
                engine_config.num_pages,
                model_config.num_kv_heads,
                engine_config.page_size,
                model_config.head_dim,
            )
            self.k_caches = jnp.zeros(cache_shape, dtype=dtype)
            self.v_caches = jnp.zeros(cache_shape, dtype=dtype)
        self._kv_specs = None  # default kv-head sharding in the TP builders
        if mesh is not None:
            if mesh.shape.get("data", 1) != 1:
                msg = (
                    "the engine's mesh must have data=1: data parallelism is "
                    "one engine per device group (see parallel.distributed)"
                )
                raise ValueError(msg)
            from jax.sharding import NamedSharding, PartitionSpec
            from conch_tpu.parallel.sharding import kv_cache_sharding, shard_llama_params

            # The sharding rules are param-path based and cover every
            # model family (Llama/Qwen2/Mistral/Gemma/Mixtral/DeepSeek).
            self.params = shard_llama_params(params, mesh)
            if getattr(self.config, "kv_cache_layout", "kv") == "mla":
                # MLA: the latent cache is MQA-shared, so every chip
                # keeps a full (tiny) replica — attention stays
                # communication-free with heads sharded.
                self._kv_specs = (PartitionSpec(), PartitionSpec())
                replicated = NamedSharding(mesh, PartitionSpec())
                self.k_caches = jax.device_put(self.k_caches, replicated)
                self.v_caches = jax.device_put(self.v_caches, replicated)
            else:
                self.k_caches = jax.device_put(self.k_caches, kv_cache_sharding(mesh))
                self.v_caches = jax.device_put(self.v_caches, kv_cache_sharding(mesh))
        self.waiting: list[Request] = []
        self.running: list[Request] = []
        self._next_id = 0
        self._rng_key = jax.random.PRNGKey(engine_config.seed)
        # Prefix cache: full-page token prefix -> page id, reverse map, and
        # LRU order of cache-held pages (the cache owns one reference).
        self._prefix_map: dict[tuple[int, ...], int] = {}
        self._page_key: dict[int, tuple[int, ...]] = {}
        self._cached_lru: dict[int, None] = {}
        # Parallel sampling groups: parent request id -> sibling ids.
        self._group: dict[int, list[int]] = {}
        self.prefix_cache_hits = 0  # tokens served from cache (stats)
        self.spec_tokens_drafted = 0
        self.spec_tokens_accepted = 0

        self._model_decode_fn = decode_fn or llama_decode_step
        self._multi_step_cache: dict[int, Any] = {}
        if prefill_fn is None and decode_fn is None and verify_fn is None:
            # Default Llama-family path: fuse QKV / gate|up into single
            # wide-N GEMMs (eager, one-time). Single-device params fuse
            # directly; TP params were sharded per-name above, then each
            # chip's LOCAL shards concatenate inside a shard_map (see
            # models.llama.fuse_llama_params_sharded). Custom model fns
            # keep their own schema.
            from conch_tpu.models.llama import fuse_llama_params, fuse_llama_params_sharded

            if mesh is None:
                self.params = fuse_llama_params(self.params)
            else:
                self.params = fuse_llama_params_sharded(self.params, mesh)
        elif mesh is None:
            # Known model families fuse too (their layer steps consume
            # fused stacks); unrecognized custom fns keep their schema.
            from conch_tpu.models.deepseek import deepseek_decode_step, fuse_deepseek_params
            from conch_tpu.models.gemma import gemma_decode_step
            from conch_tpu.models.llama import fuse_llama_params
            from conch_tpu.models.moe import mixtral_decode_step

            if decode_fn is deepseek_decode_step:
                self.params = fuse_deepseek_params(self.params)
            elif decode_fn in (gemma_decode_step, mixtral_decode_step):
                # Mixtral: attention QKV only — the expert stacks are raw
                # arrays and fuse_llama_params skips non-QuantizedLinear.
                self.params = fuse_llama_params(self.params)
        if mesh is not None:
            self._prefill_fn, self._decode_fn, self._verify_fn = self._make_tp_steps(
                mesh, prefill_fn, decode_fn, verify_fn
            )
        else:
            self._prefill_fn = jax.jit(
                functools.partial(prefill_fn or llama_prefill, config=model_config),
                static_argnames=("max_seqlen_q",),
                donate_argnames=("k_caches", "v_caches"),
            )
            self._decode_fn = jax.jit(
                functools.partial(decode_fn or llama_decode_step, config=model_config),
                donate_argnames=("k_caches", "v_caches"),
            )
            # Unjitted decode for the multi-step lax.scan wrapper.
            self._raw_decode_fn = functools.partial(
                decode_fn or llama_decode_step, config=model_config
            )
            self._verify_fn = jax.jit(
                functools.partial(verify_fn or llama_verify_forward, config=model_config),
                static_argnames=("max_seqlen_q",),
                donate_argnames=("k_caches", "v_caches"),
            )
        if engine_config.num_speculative_tokens > 0 and decode_fn is not None and verify_fn is None:
            msg = (
                "speculative decoding with a custom decode_fn needs a matching "
                "verify_fn (e.g. models.gemma.gemma_verify_forward)"
            )
            raise ValueError(msg)

    def _make_tp_steps(self, mesh, prefill_fn=None, decode_fn=None, verify_fn=None):
        """Adapt the shard_map TP steps to the engine's kwarg signatures.

        The ragged steps (prefill/verify) close over a static
        ``max_seqlen_q``; the engine buckets it to powers of two, so each
        bucket builds (and caches) one jitted step — the same recompile
        granularity as the single-device ``static_argnames`` path.
        Custom ``*_fn``s swap the model family (Gemma, Mixtral, ...); the
        TP sharding rules key on the shared param names (wq/wk/.../lm_head).
        """
        from conch_tpu.parallel.tp_inference import make_tp_decode_step, make_tp_prefill, make_tp_verify

        tp_decode = make_tp_decode_step(
            mesh, self.config, self.params, decode_fn=decode_fn or llama_decode_step,
            kv_specs=self._kv_specs, lora_example=self.lora,
        )

        def decode_adapter(params, *, token_ids, positions, seq_lens, block_tables, slot_mapping, k_caches, v_caches, lora=None, lora_ids=None):
            extra = () if lora is None else (lora, lora_ids)
            return tp_decode(params, token_ids, positions, seq_lens, block_tables, slot_mapping, k_caches, v_caches, *extra)

        def make_ragged_adapter(builder, model_fn):
            by_bucket: dict[int, Any] = {}

            def adapter(params, *, token_ids, positions, cu_seqlens_q, max_seqlen_q, seq_lens, block_tables, slot_mapping, k_caches, v_caches, lora=None, lora_ids=None):
                fn = by_bucket.get(max_seqlen_q)
                if fn is None:
                    fn = by_bucket[max_seqlen_q] = builder(
                        mesh, self.config, self.params, max_seqlen_q, model_fn,
                        kv_specs=self._kv_specs, lora_example=self.lora,
                    )
                extra = () if lora is None else (lora, lora_ids)
                return fn(params, token_ids, positions, cu_seqlens_q, seq_lens, block_tables, slot_mapping, k_caches, v_caches, *extra)

            return adapter

        return (
            make_ragged_adapter(make_tp_prefill, prefill_fn or llama_prefill),
            decode_adapter,
            make_ragged_adapter(make_tp_verify, verify_fn or llama_verify_forward),
        )

    # -- public API --------------------------------------------------------

    def add_request(
        self,
        prompt: list[int],
        sampling: SamplingParams | None = None,
        lora_id: int | None = None,
    ) -> int:
        ps = self.ecfg.page_size
        cap_pages = min(self.ecfg.max_pages_per_seq, self.ecfg.num_pages)
        # Rolling KV: any prompt length the ROPE CACHE covers fits —
        # prefill wraps the ring, but positions past the model's
        # max_position would silently clamp to the last cached rotation.
        if self._cap_tokens is None:
            if len(prompt) + 1 > cap_pages * ps:
                msg = (
                    f"prompt of {len(prompt)} tokens can never fit: engine caps a "
                    f"sequence at {cap_pages} pages x {ps} slots"
                )
                raise ValueError(msg)
        else:
            max_pos = getattr(self.config, "max_position", None)
            if max_pos is not None and len(prompt) + 1 > max_pos:
                msg = (
                    f"prompt of {len(prompt)} tokens exceeds the model's rope "
                    f"range (max_position {max_pos})"
                )
                raise ValueError(msg)
        sampling = sampling or SamplingParams()
        if sampling.n < 1:
            msg = f"sampling.n must be >= 1, got {sampling.n}"
            raise ValueError(msg)
        if sampling.guided is not None:
            if self.ecfg.eos_token_id is None:
                msg = "guided decoding requires eos_token_id (the FSM finishes by emitting EOS)"
                raise ValueError(msg)
            fsm_vocab = sampling.guided.transitions.shape[1]
            if fsm_vocab != self.config.vocab_size:
                msg = (
                    f"guided FSM was built over a vocab of {fsm_vocab} tokens, "
                    f"model vocab is {self.config.vocab_size}"
                )
                raise ValueError(msg)
        if lora_id is None:
            lora_id = -1
        else:
            num_adapters = 0 if self.lora is None else int(self.lora["scales"].shape[0])
            if not 0 <= lora_id < num_adapters:
                msg = f"lora_id {lora_id} out of range: engine holds {num_adapters} adapters"
                raise ValueError(msg)
        rid = self._next_id
        self._next_id += 1
        self.waiting.append(Request(rid, list(prompt), sampling, lora_id=lora_id))
        return rid

    def stats(self) -> dict:
        """Serving counters snapshot (observability)."""
        return {
            "running": len(self.running),
            "waiting": len(self.waiting),
            "free_pages": self.allocator.num_free,
            "total_pages": self.ecfg.num_pages,
            "cached_prefix_pages": len(self._cached_lru),
            "prefix_cache_hit_tokens": self.prefix_cache_hits,
            "spec_tokens_drafted": self.spec_tokens_drafted,
            "spec_tokens_accepted": self.spec_tokens_accepted,
        }

    def abort_request(self, request_id: int) -> bool:
        """Cancel a live request and release its pages immediately.

        Prefix-cached pages survive (the cache owns its own reference,
        exactly as on normal finish). Aborting a parallel-sampling parent
        aborts its whole group. Returns False if the id is unknown or
        already finished.
        """
        for sib_id in self._group.get(request_id, []):
            self.abort_request(sib_id)
        for i, r in enumerate(self.waiting):
            if r.request_id == request_id:
                self.waiting.pop(i)
                r.state = RequestState.FINISHED
                return True
        for r in self.running:
            if r.request_id == request_id:
                for page in r.pages:
                    self.allocator.free(page)
                r.pages = []
                r.state = RequestState.FINISHED
                self.running = [x for x in self.running if x.request_id != request_id]
                return True
        return False

    def generate(
        self,
        prompts: list[list[int]],
        sampling: SamplingParams | None = None,
        lora_ids: list[int | None] | None = None,
    ) -> list:
        """Offline batch generation.

        Returns one output token list per prompt, or — with parallel
        sampling (``sampling.n > 1``) — a list of ``n`` output lists per
        prompt (the parent's completion first). ``lora_ids`` optionally
        picks an adapter per prompt (None = base model).
        """
        lora_ids = lora_ids or [None] * len(prompts)
        ids = [
            self.add_request(p, sampling, lora_id=lid)
            for p, lid in zip(prompts, lora_ids)
        ]
        results: dict[int, list[int]] = {}
        while self.waiting or self.running:
            for req in self.step():
                results[req.request_id] = req.output_tokens
        if sampling is not None and sampling.n > 1:
            # .get: a parent truncated before prefill never spawned its
            # group; externally-aborted siblings have no recorded output.
            return [
                [results[i], *(results.get(s, []) for s in self._group.get(i, []))]
                for i in ids
            ]
        return [results[i] for i in ids]

    def step(self) -> list[Request]:
        """Run one engine step; returns requests that finished this step."""
        self._admit()
        if not self.running:
            return []

        prefilling = [r for r in self.running if r.state == RequestState.PREFILLING]
        if prefilling:
            batch = prefilling
            if self.ecfg.mixed_batching:
                # Decodes join the varlen step (1 token each, budget
                # priority) so they keep streaming during long prefills.
                decodes = self._ensure_decode_pages(
                    [r for r in self.running if r.state == RequestState.RUNNING]
                )
                # Page growth may have preempted a prefilling request:
                # re-check state before batching.
                batch = decodes + [
                    r for r in prefilling if r.state == RequestState.PREFILLING
                ]
            self._run_prefill(batch)
        else:
            decodable = [r for r in self.running if r.state == RequestState.RUNNING]
            # Speculation and multi-step both advance with RAW greedy
            # argmax: every request must be plain greedy with no pending
            # logit rules.
            all_plain_greedy = all(
                r.sampling.temperature <= 0.0
                and r.sampling.repetition_penalty == 1.0
                and not r.sampling.logit_bias
                and not r.sampling.logprobs
                and r.sampling.guided is None
                and len(r.output_tokens) >= r.sampling.min_tokens
                for r in decodable
            )
            use_spec = self.ecfg.num_speculative_tokens > 0 and all_plain_greedy
            k = self.ecfg.multi_step_decode
            use_multi = not use_spec and k > 1 and all_plain_greedy
            if use_spec:
                self._run_spec_decode(decodable)
            elif use_multi:
                self._run_multi_step_decode(decodable, k)
            else:
                self._run_decode(self._ensure_decode_pages(decodable))

        finished = [r for r in self.running if r.state == RequestState.FINISHED]
        for req in finished:
            for page in req.pages:
                self.allocator.free(page)
            req.pages = []
        self.running = [r for r in self.running if r.state != RequestState.FINISHED]
        return finished

    # -- scheduling --------------------------------------------------------

    def _prefix_lookup(self, req: Request) -> list[int]:
        """Longest chain of cached full-prefix pages usable by ``req``
        (always leaving >=1 token to prefill so logits are produced)."""
        if not self.ecfg.enable_prefix_caching:
            return []
        ps = self.ecfg.page_size
        shared: list[int] = []
        max_k = min((req.total_len - 1) // ps, self.ecfg.max_pages_per_seq)
        for k in range(1, max_k + 1):
            # Keys carry the adapter id: LoRA on wk/wv changes the KV a
            # page holds, so pages are shareable only within one adapter.
            key = (req.lora_id, *(req.token_at(p) for p in range(k * ps)))
            page = self._prefix_map.get(key)
            if page is None:
                break
            shared.append(page)
        return shared

    def _register_prefix_pages(self, req: Request) -> None:
        """Publish ``req``'s computed full prompt pages into the prefix
        cache (the cache takes one reference per page)."""
        if not self.ecfg.enable_prefix_caching:
            return
        ps = self.ecfg.page_size
        for k in range(1, len(req.prompt) // ps + 1):
            page = req.pages[k - 1]
            key = (req.lora_id, *req.prompt[: k * ps])
            if key in self._prefix_map:
                continue
            self._prefix_map[key] = page
            self._page_key[page] = key
            self.allocator.fork(page)
            self._cached_lru[page] = None

    def _reclaim(self, n: int) -> None:
        """Evict LRU prefix-cache pages until ``n`` pages are allocatable."""
        while not self.allocator.can_allocate(n) and self._cached_lru:
            page = next(iter(self._cached_lru))
            del self._cached_lru[page]
            del self._prefix_map[self._page_key.pop(page)]
            self.allocator.free(page)

    def _admit(self) -> None:
        # Allocate-on-demand: reserve pages for the tokens to prefill
        # (prompt, plus any generated tokens being recomputed after a
        # preemption) + one decode-headroom page; decode growth allocates
        # page-by-page in _ensure_decode_pages. Cached full-prefix pages
        # are shared instead of recomputed.
        ps = self.ecfg.page_size
        while self.waiting and len(self.running) < self.ecfg.max_batch_size:
            req = self.waiting[0]
            pages_needed = min(-(-(req.total_len + 1) // ps), self._page_cap)
            if pages_needed > self.ecfg.num_pages:
                # Grew past the whole pool (preempted, can never recompute):
                # finish truncated instead of waiting forever.
                self.waiting.pop(0)
                req.state = RequestState.FINISHED
                self.running.append(req)
                continue
            shared = self._prefix_lookup(req)
            fresh_needed = pages_needed - len(shared)
            # Fork (and LRU-touch) the shared pages BEFORE reclaiming:
            # _reclaim evicts LRU cache pages, and without a held reference
            # it could free the very pages _prefix_lookup just returned.
            for page in shared:
                self.allocator.fork(page)
                if page in self._cached_lru:
                    self._cached_lru[page] = self._cached_lru.pop(page)  # LRU touch
            self._reclaim(fresh_needed)
            if not self.allocator.can_allocate(fresh_needed):
                for page in shared:  # drop the holds; cache refs (if any) remain
                    self.allocator.free(page)
                break
            self.waiting.pop(0)
            req.pages = shared + [self.allocator.allocate() for _ in range(fresh_needed)]
            req.num_computed = len(shared) * ps
            self.prefix_cache_hits += req.num_computed
            req.state = RequestState.PREFILLING
            self.running.append(req)

    def _preempt_one(self) -> bool:
        """Preempt the youngest decodable request: free its pages and
        requeue it (front of the waiting queue) for recompute-prefill."""
        for victim in reversed(self.running):
            if victim.state in (RequestState.RUNNING, RequestState.PREFILLING):
                for page in victim.pages:
                    self.allocator.free(page)
                victim.pages = []
                victim.num_computed = 0
                victim.num_preemptions += 1
                victim.state = RequestState.WAITING
                self.running.remove(victim)
                self.waiting.insert(0, victim)
                return True
        return False

    def _ensure_decode_pages(
        self, reqs: list[Request], extra: dict[int, int] | None = None
    ) -> list[Request]:
        """Grow each sequence's page list to cover its next KV write (plus
        ``extra`` speculative slots); preempt younger requests when the
        pool runs dry. Returns the requests that still hold enough pages
        to step."""
        ps = self.ecfg.page_size
        ready = []
        for r in reqs:
            if r.state != RequestState.RUNNING:
                # Preempted by an earlier request's growth in this same
                # pass: its pages are gone; growing it now would attach
                # pages that _admit later replaces wholesale (leak).
                continue
            needed = -(-(r.total_len + (extra or {}).get(r.request_id, 0)) // ps)
            ok = True
            while len(r.pages) < min(needed, self._page_cap):
                self._reclaim(1)  # evict cached prefix pages before preempting
                if self.allocator.can_allocate(1):
                    r.pages.append(self.allocator.allocate())
                    continue
                if not self._preempt_one():
                    ok = False
                    break
                # _preempt_one may have preempted r itself.
                if r.state == RequestState.WAITING:
                    ok = False
                    break
            if ok and r.state == RequestState.RUNNING:
                ready.append(r)
        # A request admitted to `ready` early can be preempted by a later
        # request's allocation in this same pass — re-check state and
        # page coverage before stepping. Coverage clamps at the page cap:
        # a request within `extra` tokens of its cap still steps (writes
        # past its owned pages are masked / overshoot tokens discarded)
        # and finishes at_cap — without the clamp it would be filtered
        # forever while staying RUNNING (livelock).
        cap_tokens = self._page_cap * ps
        return [
            r for r in ready
            if r.state == RequestState.RUNNING
            and len(r.pages) * ps
            >= min(r.total_len + (extra or {}).get(r.request_id, 0), cap_tokens)
        ]

    def _slot(self, req: Request, pos: int) -> int:
        if self._cap_tokens is not None:
            pos = pos % self._cap_tokens  # rolling KV: ring slot
        return req.pages[pos // self.ecfg.page_size] * self.ecfg.page_size + pos % self.ecfg.page_size

    def _block_table_rows(self, reqs: list[Request]) -> np.ndarray:
        bt = np.zeros((len(reqs), self.ecfg.max_pages_per_seq), dtype=np.int32)
        for i, r in enumerate(reqs):
            bt[i, : len(r.pages)] = r.pages
        return bt

    # -- device steps ------------------------------------------------------

    def _lora_kwargs(self, per_row: list[int], n_pad: int) -> dict:
        """Extra step kwargs for multi-LoRA: the stacked adapters + the
        per-token adapter-id array (padding rows are -1 = zero selector)."""
        if self.lora is None:
            return {}
        ids = np.full(n_pad, -1, dtype=np.int32)
        ids[: len(per_row)] = per_row
        return {"lora": self.lora, "lora_ids": jnp.asarray(ids)}

    def _run_prefill(self, reqs: list[Request]) -> None:
        budget = self.ecfg.max_prefill_tokens
        batch: list[tuple[Request, int]] = []  # (request, chunk_len)
        for r in reqs:
            remaining = r.total_len - r.num_computed
            take = min(remaining, budget)
            if take <= 0:
                continue
            batch.append((r, take))
            budget -= take
            if budget <= 0:
                break
        if not batch:
            return

        tokens, positions, slots, q_lens, seq_lens, loras = [], [], [], [], [], []
        for r, take in batch:
            start = r.num_computed
            tokens.extend(r.token_at(p) for p in range(start, start + take))
            positions.extend(range(start, start + take))
            slots.extend(self._slot(r, p) for p in range(start, start + take))
            q_lens.append(take)
            seq_lens.append(start + take)
            loras.extend([r.lora_id] * take)

        total = len(tokens)
        total_pad = _bucket(total)
        max_q = _bucket(max(q_lens))
        bpad = self.ecfg.max_batch_size

        tokens_arr = np.zeros(total_pad, dtype=np.int32)
        tokens_arr[:total] = tokens
        positions_arr = np.zeros(total_pad, dtype=np.int32)
        positions_arr[:total] = positions
        slots_arr = np.full(total_pad, -1, dtype=np.int32)
        slots_arr[:total] = slots

        cu = np.zeros(bpad + 1, dtype=np.int32)
        cu[1 : len(batch) + 1] = np.cumsum(q_lens)
        cu[len(batch) + 1 :] = total  # zero-length padding sequences
        sl = np.zeros(bpad, dtype=np.int32)
        sl[: len(batch)] = seq_lens
        bt = np.zeros((bpad, self.ecfg.max_pages_per_seq), dtype=np.int32)
        bt[: len(batch)] = self._block_table_rows([r for r, _ in batch])

        logits, self.k_caches, self.v_caches = self._prefill_fn(
            self.params,
            token_ids=jnp.asarray(tokens_arr),
            positions=jnp.asarray(positions_arr),
            cu_seqlens_q=jnp.asarray(cu),
            max_seqlen_q=max_q,
            seq_lens=jnp.asarray(sl),
            block_tables=jnp.asarray(bt),
            slot_mapping=jnp.asarray(slots_arr),
            k_caches=self.k_caches,
            v_caches=self.v_caches,
            **self._lora_kwargs(loras, total_pad),
        )

        # Advance chunk progress; sample for requests whose tokens are all
        # computed (a completed prompt, or a mixed-in decode row).
        done_rows = []
        fresh_prompt_rows = set()
        for i, (r, take) in enumerate(batch):
            was_prefilling = r.state == RequestState.PREFILLING
            r.num_computed += take
            if r.num_computed >= r.total_len:
                done_rows.append(i)
                if was_prefilling:
                    fresh_prompt_rows.add(i)
        if done_rows:
            sampled = self._sample(logits, [batch[i][0] for i in done_rows], rows=done_rows)
            for i, tok in zip(done_rows, sampled):
                r = batch[i][0]
                if i in fresh_prompt_rows:  # not mixed-in decode rows
                    self._register_prefix_pages(r)
                if r.sampling.n > 1 and r.parent_id is None and not r.siblings_spawned:
                    self._spawn_siblings(r, logits[i])
                r.output_tokens.append(int(tok))
                r.state = RequestState.RUNNING
                self._maybe_finish(r)

    def _copy_page(self, src: int, dst: int) -> None:
        """Device-copy one KV page across all layers (stacked caches)."""
        if self.v_caches.size:
            self.k_caches, self.v_caches = _copy_page_jit(
                self.k_caches, self.v_caches, src, dst
            )
        else:  # MLA: single packed cache
            self.k_caches = _copy_page_k_jit(self.k_caches, src, dst)

    def _spawn_siblings(self, parent: Request, logits_row: jax.Array) -> None:
        """Parallel sampling (``sampling.n > 1``): fork n-1 siblings off
        the freshly prefilled parent.

        Full prompt pages are shared copy-on-read (refcount fork — decode
        never writes a full page); the partial tail page is device-copied
        per sibling, since each sibling writes its own continuation there.
        Each running sibling draws its own first token from the parent's
        last-token logits. Siblings that cannot fork (batch full, pool
        dry, or rolling KV — ring pages are rewritten in place, so they
        cannot be shared) fall back to the waiting queue and recompute
        the prompt as an ordinary prefill (an independent first-token
        draw; still an iid sample).
        """
        parent.siblings_spawned = True
        ps = self.ecfg.page_size
        compute_len = parent.total_len  # == prompt length at spawn time
        full = compute_len // ps
        partial = compute_len % ps
        group = self._group.setdefault(parent.request_id, [])
        ready: list[Request] = []
        for _ in range(parent.sampling.n - 1):
            rid = self._next_id
            self._next_id += 1
            sib = Request(
                rid, list(parent.prompt), parent.sampling, parent_id=parent.request_id,
                lora_id=parent.lora_id,
            )
            group.append(rid)
            can_fork = (
                len(self.running) < self.ecfg.max_batch_size and self._cap_tokens is None
            )
            if can_fork:
                self._reclaim(1 if partial else 0)
                can_fork = self.allocator.can_allocate(1 if partial else 0)
            if can_fork:
                for page in parent.pages[:full]:
                    self.allocator.fork(page)
                sib.pages = list(parent.pages[:full])
                if partial:
                    fresh = self.allocator.allocate()
                    sib.pages.append(fresh)
                    self._copy_page(parent.pages[full], fresh)
                sib.num_computed = compute_len
                sib.state = RequestState.RUNNING
                self.running.append(sib)
                ready.append(sib)
            else:
                self.waiting.append(sib)
        if ready:
            tiled = jnp.broadcast_to(logits_row[None], (len(ready), logits_row.shape[-1]))
            toks = self._sample(tiled, ready, rows=list(range(len(ready))))
            for sib, tok in zip(ready, toks):
                sib.output_tokens.append(int(tok))
                self._maybe_finish(sib)

    def _run_decode(self, reqs: list[Request]) -> None:
        if not reqs:
            return
        bpad = self.ecfg.max_batch_size

        tokens = np.zeros(bpad, dtype=np.int32)
        positions = np.zeros(bpad, dtype=np.int32)
        seq_lens = np.zeros(bpad, dtype=np.int32)
        slots = np.full(bpad, -1, dtype=np.int32)
        bt = np.zeros((bpad, self.ecfg.max_pages_per_seq), dtype=np.int32)

        for i, r in enumerate(reqs):
            pos = r.total_len - 1  # position of the newest (already sampled) token
            tokens[i] = r.output_tokens[-1]
            positions[i] = pos
            seq_lens[i] = r.total_len
            slots[i] = self._slot(r, pos)
        bt[: len(reqs)] = self._block_table_rows(reqs)

        logits, self.k_caches, self.v_caches = self._decode_fn(
            self.params,
            token_ids=jnp.asarray(tokens),
            positions=jnp.asarray(positions),
            seq_lens=jnp.asarray(seq_lens),
            block_tables=jnp.asarray(bt),
            slot_mapping=jnp.asarray(slots),
            k_caches=self.k_caches,
            v_caches=self.v_caches,
            **self._lora_kwargs([r.lora_id for r in reqs], bpad),
        )

        sampled = self._sample(logits, reqs, rows=list(range(len(reqs))))
        for r, tok in zip(reqs, sampled):
            r.output_tokens.append(int(tok))
            r.num_computed = r.total_len - 1  # KV covers all but the new token
            self._maybe_finish(r)

    def _multi_step_fn(self, k: int):
        """Jitted K-iteration greedy decode scan (built once per K)."""
        fn = self._multi_step_cache.get(k)
        if fn is not None:
            return fn
        if self.mesh is not None:
            from conch_tpu.parallel.tp_inference import make_tp_multi_decode_step

            fn = make_tp_multi_decode_step(
                self.mesh, self.config, self.params, k,
                decode_fn=self._model_decode_fn,
                page_size=self.ecfg.page_size,
                max_batch_size=self.ecfg.max_batch_size,
                ring_tokens=self._cap_tokens or 0,
                kv_specs=self._kv_specs,
                lora_example=self.lora,
            )
            self._multi_step_cache[k] = fn
            return fn
        from conch_tpu.parallel.tp_inference import make_multi_step_scan

        raw = self._raw_decode_fn

        def decode_with_config(params, tokens, positions, seq_lens, bt, slots, kc, vc, *lora_args):
            kw = {"lora": lora_args[0], "lora_ids": lora_args[1]} if lora_args else {}
            return raw(
                params, token_ids=tokens, positions=positions, seq_lens=seq_lens,
                block_tables=bt, slot_mapping=slots, k_caches=kc, v_caches=vc, **kw,
            )

        def greedy(logits):
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

        multi = make_multi_step_scan(
            decode_with_config, k, self.ecfg.page_size, self.ecfg.max_batch_size, greedy,
            ring_tokens=self._cap_tokens or 0,
        )
        fn = jax.jit(multi, donate_argnums=(6, 7))
        self._multi_step_cache[k] = fn
        return fn

    def _run_multi_step_decode(self, reqs: list[Request], k: int) -> None:
        """K greedy decode steps in one dispatch; host applies finish rules
        per token and discards overshoot (KV past a finish sits beyond the
        rewound seq_len — masked by attention and overwritten later)."""
        reqs = self._ensure_decode_pages(reqs, extra={r.request_id: k - 1 for r in reqs})
        if not reqs:
            return
        bpad = self.ecfg.max_batch_size
        ps = self.ecfg.page_size

        tokens = np.zeros(bpad, dtype=np.int32)
        positions = np.zeros(bpad, dtype=np.int32)
        active = np.zeros(bpad, dtype=bool)
        limit = np.zeros(bpad, dtype=np.int32)
        bt = np.zeros((bpad, self.ecfg.max_pages_per_seq), dtype=np.int32)
        for i, r in enumerate(reqs):
            tokens[i] = r.output_tokens[-1]
            positions[i] = r.total_len - 1
            active[i] = True
            if self._cap_tokens is not None and len(r.pages) >= self._page_cap:
                limit[i] = 2**30  # fully-grown ring: writes wrap, never OOB
            else:
                limit[i] = len(r.pages) * ps
        bt[: len(reqs)] = self._block_table_rows(reqs)

        if self.lora is None:
            extra = ()
        else:
            ids = np.full(bpad, -1, dtype=np.int32)
            ids[: len(reqs)] = [r.lora_id for r in reqs]
            extra = (self.lora, jnp.asarray(ids))
        toks, self.k_caches, self.v_caches = self._multi_step_fn(k)(
            self.params, jnp.asarray(tokens), jnp.asarray(positions),
            jnp.asarray(active), jnp.asarray(limit), jnp.asarray(bt),
            self.k_caches, self.v_caches, *extra,
        )
        toks = np.asarray(toks)  # (k, bpad)
        for i, r in enumerate(reqs):
            for step in range(k):
                r.output_tokens.append(int(toks[step, i]))
                self._maybe_finish(r)
                if r.state == RequestState.FINISHED:
                    break
            r.num_computed = r.total_len - 1

    def _draft(self, req: Request) -> list[int]:
        """Prompt-lookup draft: find the most recent earlier occurrence of
        the trailing n-gram in the sequence's own history and propose its
        continuation."""
        n, limit = self.ecfg.speculative_ngram, self.ecfg.num_speculative_tokens
        hist = req.prompt + req.output_tokens
        if len(hist) <= n:
            return []
        pattern = hist[-n:]
        # Cap the draft so the sequence cannot exceed its page cap
        # (rolling KV: length is not page-bound, the ring wraps).
        if self._cap_tokens is None:
            room = self.ecfg.max_pages_per_seq * self.ecfg.page_size - req.total_len - 1
        else:
            room = limit
        limit = min(limit, req.sampling.max_tokens - len(req.output_tokens), max(room, 0))
        for start in range(len(hist) - n - 1, -1, -1):
            if hist[start : start + n] == pattern:
                return hist[start + n : start + n + limit]
        return []

    def _run_spec_decode(self, reqs: list[Request]) -> None:
        """Greedy decode with prompt-lookup speculation: one varlen forward
        verifies [last_token] + draft per sequence; the longest correct
        draft prefix is accepted plus one bonus token from the model. KV
        written for rejected positions sits past the rewound seq_len —
        masked by attention and overwritten by later steps."""
        drafts = {r.request_id: self._draft(r) for r in reqs}
        reqs = self._ensure_decode_pages(
            reqs, extra={r.request_id: len(drafts[r.request_id]) for r in reqs}
        )
        if not reqs:
            return

        tokens, positions, slots, q_lens, seq_lens, loras = [], [], [], [], [], []
        for r in reqs:
            d = drafts[r.request_id]
            qs = [r.output_tokens[-1], *d]
            start = r.total_len - 1
            tokens.extend(qs)
            positions.extend(range(start, start + len(qs)))
            slots.extend(self._slot(r, p) for p in range(start, start + len(qs)))
            q_lens.append(len(qs))
            seq_lens.append(start + len(qs))
            loras.extend([r.lora_id] * len(qs))

        total = len(tokens)
        total_pad = _bucket(total)
        max_q = _bucket(max(q_lens))
        bpad = self.ecfg.max_batch_size

        tokens_arr = np.zeros(total_pad, dtype=np.int32)
        tokens_arr[:total] = tokens
        positions_arr = np.zeros(total_pad, dtype=np.int32)
        positions_arr[:total] = positions
        slots_arr = np.full(total_pad, -1, dtype=np.int32)
        slots_arr[:total] = slots

        cu = np.zeros(bpad + 1, dtype=np.int32)
        cu[1 : len(reqs) + 1] = np.cumsum(q_lens)
        cu[len(reqs) + 1 :] = total
        sl = np.zeros(bpad, dtype=np.int32)
        sl[: len(reqs)] = seq_lens
        bt = np.zeros((bpad, self.ecfg.max_pages_per_seq), dtype=np.int32)
        bt[: len(reqs)] = self._block_table_rows(reqs)

        logits, self.k_caches, self.v_caches = self._verify_fn(
            self.params,
            token_ids=jnp.asarray(tokens_arr),
            positions=jnp.asarray(positions_arr),
            cu_seqlens_q=jnp.asarray(cu),
            max_seqlen_q=max_q,
            seq_lens=jnp.asarray(sl),
            block_tables=jnp.asarray(bt),
            slot_mapping=jnp.asarray(slots_arr),
            k_caches=self.k_caches,
            v_caches=self.v_caches,
            **self._lora_kwargs(loras, total_pad),
        )
        preds = np.asarray(jnp.argmax(logits[:total], axis=-1))

        offset = 0
        for r, qn in zip(reqs, q_lens):
            d = drafts[r.request_id]
            row_preds = preds[offset : offset + qn]
            offset += qn
            accepted = 0
            while accepted < len(d) and row_preds[accepted] == d[accepted]:
                accepted += 1
            self.spec_tokens_accepted += accepted
            self.spec_tokens_drafted += len(d)
            for tok in [*d[:accepted], int(row_preds[accepted])]:
                r.output_tokens.append(int(tok))
                self._maybe_finish(r)
                if r.state == RequestState.FINISHED:
                    break
            r.num_computed = r.total_len - 1

    def _sample(self, logits: jax.Array, reqs: list[Request], rows: list[int]) -> np.ndarray:
        self._rng_key, key = jax.random.split(self._rng_key)
        temps = np.zeros(logits.shape[0], dtype=np.float32)
        top_ks = np.zeros(logits.shape[0], dtype=np.int32)
        top_ps = np.ones(logits.shape[0], dtype=np.float32)
        for row, r in zip(rows, reqs):
            temps[row] = r.sampling.temperature
            top_ks[row] = r.sampling.top_k
            top_ps[row] = r.sampling.top_p
        logits = self._apply_logit_rules(logits, reqs, rows)
        toks = sample_tokens(
            logits, key, jnp.asarray(temps), top_k=jnp.asarray(top_ks), top_p=jnp.asarray(top_ps)
        )
        out = np.asarray(toks)[rows]
        lp_pairs = [(row, r) for row, r in zip(rows, reqs) if r.sampling.logprobs]
        if lp_pairs:
            lp_rows = jnp.asarray([row for row, _ in lp_pairs])
            lsm = jax.nn.log_softmax(logits[lp_rows].astype(jnp.float32), axis=-1)
            chosen = jnp.asarray(np.asarray(toks)[np.asarray([row for row, _ in lp_pairs])])
            vals = np.asarray(jnp.take_along_axis(lsm, chosen[:, None], axis=-1))[:, 0]
            for (_, r), v in zip(lp_pairs, vals):
                r.output_logprobs.append(float(v))
        return out

    def _apply_logit_rules(self, logits: jax.Array, reqs: list[Request], rows: list[int]) -> jax.Array:
        """min_tokens eos/stop suppression + repetition penalty (host-built
        sparse index lists, one scatter each; no-ops cost nothing)."""
        sup_r, sup_c = [], []
        pen_r, pen_c, pen_v = [], [], []
        bias_r, bias_c, bias_v = [], [], []
        eos = self.ecfg.eos_token_id
        for row, r in zip(rows, reqs):
            s = r.sampling
            if len(r.output_tokens) < s.min_tokens:
                for tok in ({eos} if eos is not None else set()) | set(s.stop_token_ids):
                    sup_r.append(row)
                    sup_c.append(tok)
            if s.repetition_penalty != 1.0:
                for tok in set(r.prompt) | set(r.output_tokens):
                    pen_r.append(row)
                    pen_c.append(tok)
                    pen_v.append(s.repetition_penalty)
            for tok, bias in s.logit_bias:
                bias_r.append(row)
                bias_c.append(tok)
                bias_v.append(bias)
        if sup_r:
            logits = logits.at[jnp.asarray(sup_r), jnp.asarray(sup_c)].set(-jnp.inf)
        if pen_r:
            rr, cc = jnp.asarray(pen_r), jnp.asarray(pen_c)
            seen = logits[rr, cc]
            pv = jnp.asarray(pen_v, jnp.float32)
            logits = logits.at[rr, cc].set(jnp.where(seen > 0, seen / pv, seen * pv))
        if bias_r:
            logits = logits.at[jnp.asarray(bias_r), jnp.asarray(bias_c)].add(
                jnp.asarray(bias_v, jnp.float32)
            )
        logits = self._apply_guided_masks(logits, reqs, rows)
        return logits

    def _guided_state(self, req: Request) -> int:
        """Current FSM state, derived from output_tokens with an O(1)
        incremental cache (recompute-safe: falls back to a full walk)."""
        fsm = req.sampling.guided
        n_cached, state = req.guided_cache
        if n_cached > len(req.output_tokens):
            n_cached, state = 0, fsm.start_state
        state = fsm.walk(req.output_tokens[n_cached:], state)
        req.guided_cache = (len(req.output_tokens), state)
        return state

    def _apply_guided_masks(
        self, logits: jax.Array, reqs: list[Request], rows: list[int]
    ) -> jax.Array:
        """Guided decoding: mask tokens the request's FSM disallows.

        EOS is legal only in accepting states; once a state has no legal
        continuation tokens (terminal accept, or a dead state from an
        earlier engine bug), EOS is FORCED so the request finishes rather
        than sampling from an all--inf row.
        """
        pairs = [(row, r) for row, r in zip(rows, reqs) if r.sampling.guided is not None]
        if not pairs:
            return logits
        eos = self.ecfg.eos_token_id
        vocab = logits.shape[-1]
        mask_rows = np.zeros((len(pairs), vocab), dtype=bool)
        idx_rows = np.empty(len(pairs), dtype=np.int32)
        forced: list[int] = []  # rows where EOS is the only legal outcome
        for i, (row, r) in enumerate(pairs):
            fsm = r.sampling.guided
            state = self._guided_state(r)
            idx_rows[i] = row
            if state >= 0:
                allowed = fsm.allowed[state].copy()
                can_extend = bool(allowed.any())
                if fsm.accepting[state]:
                    allowed[eos] = True
                if not can_extend:
                    allowed[:] = False
                    allowed[eos] = True
                    forced.append(row)
            else:  # dead (shouldn't happen: transitions are masked)
                allowed = np.zeros(vocab, dtype=bool)
                allowed[eos] = True
                forced.append(row)
            mask_rows[i] = allowed
        rr = jnp.asarray(idx_rows)
        keep = jnp.asarray(mask_rows)
        sub = jnp.where(keep, logits[rr], -jnp.inf)
        logits = logits.at[rr].set(sub)
        if forced:
            # Finite value beats every -inf row-mate even if min_tokens
            # suppressed EOS earlier in this function.
            logits = logits.at[jnp.asarray(forced), eos].set(0.0)
        return logits

    def _maybe_finish(self, req: Request) -> None:
        eos = self.ecfg.eos_token_id
        last = req.output_tokens[-1] if req.output_tokens else None
        hit_stop = last is not None and (last == eos or last in req.sampling.stop_token_ids)
        if hit_stop and len(req.output_tokens) < req.sampling.min_tokens:
            hit_stop = False  # suppressed at sampling; belt-and-braces here
            if req.sampling.guided is not None and last == eos:
                # A guided request finishes when its FSM cannot extend the
                # match — min_tokens cannot force tokens the constraint
                # forbids. (State walked without the final EOS token.)
                fsm = req.sampling.guided
                state = fsm.walk(req.output_tokens[:-1])
                if state < 0 or not bool(fsm.allowed[state].any()):
                    hit_stop = True
        out_of_len = len(req.output_tokens) >= req.sampling.max_tokens
        # Hard cap only: pages grow on demand up to max_pages_per_seq.
        # Rolling KV: length is never page-bound (the ring wraps) but IS
        # rope-bound — positions past max_position would reuse the last
        # cached rotation, silently corrupting output.
        if self._cap_tokens is None:
            at_cap = req.total_len >= self.ecfg.max_pages_per_seq * self.ecfg.page_size
        else:
            max_pos = getattr(self.config, "max_position", None)
            at_cap = max_pos is not None and req.total_len >= max_pos
        if hit_stop or out_of_len or at_cap:
            req.state = RequestState.FINISHED
