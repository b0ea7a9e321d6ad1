# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tensor-parallel serving steps via shard_map + explicit ICI collectives.

Pallas kernels need per-chip shapes, so the TP serving path uses
``jax.shard_map`` (not GSPMD auto-partitioning): every chip runs the
*same* Pallas-backed Llama step on its head/column shard of the weights
and its kv-head shard of the paged cache, with exactly two ``psum``s per
layer (after the row-parallel wo and w_down) plus one logits all-gather —
the Megatron communication pattern mapped to ICI.

Batch is simultaneously sharded over the "data" axis (pure DP: no
collectives in the forward).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from conch_tpu.models.llama import LlamaConfig, llama_decode_step, llama_prefill, llama_verify_forward
from conch_tpu.parallel.sharding import kv_cache_pspec, llama_param_pspecs, lora_pspecs


def _has_sharded_head(params_example: Any) -> bool:
    """True when the model's logits are vocab-column-sharded (a dedicated
    ``lm_head`` projection, sharded by the Megatron rules) and therefore
    need an all-gather; tied-embedding models (Gemma) compute the full
    vocab replicated on every chip — gathering THOSE would concatenate n
    identical copies, corrupting sampling past argmax."""
    return isinstance(params_example, dict) and "lm_head" in params_example


def make_tp_decode_step(
    mesh: Mesh, config: Any, params_example: Any, decode_fn=llama_decode_step,
    kv_specs: tuple | None = None, lora_example: Any = None,
):
    """Build a jitted tensor+data-parallel decode step over ``mesh``.

    The returned function has the same signature as ``llama_decode_step``
    minus ``config``/``tp_axis``; inputs arrive with global shapes and the
    batch dimension is sharded over "data", heads/vocab over "model".

    ``decode_fn`` swaps the model family (``llama_decode_step`` default,
    ``moe.mixtral_decode_step`` for Mixtral — its MoE layers ride the same
    "model" axis as expert parallelism).

    ``kv_specs`` overrides the (k, v) cache PartitionSpecs — kv-head
    sharding by default; MLA passes (P(), P()) (replicated latent cache +
    empty v placeholder).

    ``lora_example`` (a stacked adapter set) switches on multi-LoRA: the
    returned step takes two extra trailing args ``(lora, lora_ids)``;
    adapter stacks shard by the Megatron-consistent LoRA rules
    (``sharding.lora_pspecs``), ids replicate.
    """
    k_spec, v_spec = kv_specs or (kv_cache_pspec(), kv_cache_pspec())
    param_specs = llama_param_pspecs(params_example)
    gather_logits = _has_sharded_head(params_example)
    data_specs = dict(
        token_ids=P("data"),
        positions=P("data"),
        seq_lens=P("data"),
        block_tables=P("data", None),
        slot_mapping=P("data"),
    )

    def local_step(params, token_ids, positions, seq_lens, block_tables, slot_mapping, k_caches, v_caches, *lora_args):
        lora_kw = (
            {"lora": lora_args[0], "lora_ids": lora_args[1]} if lora_args else {}
        )
        logits, k_caches, v_caches = decode_fn(
            params, config, token_ids, positions, seq_lens, block_tables,
            slot_mapping, k_caches, v_caches, tp_axis="model", **lora_kw,
        )
        if gather_logits:
            # Vocab is column-sharded: gather the full logits row.
            logits = jax.lax.all_gather(logits, "model", axis=1, tiled=True)
        return logits, k_caches, v_caches

    extra_specs = () if lora_example is None else (lora_pspecs(lora_example), P("data"))
    shard_mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            param_specs,
            data_specs["token_ids"],
            data_specs["positions"],
            data_specs["seq_lens"],
            data_specs["block_tables"],
            data_specs["slot_mapping"],
            k_spec,
            v_spec,
            *extra_specs,
        ),
        out_specs=(P("data"), k_spec, v_spec),
        check_vma=False,
    )
    return jax.jit(shard_mapped, donate_argnums=(6, 7))


def _make_tp_varlen_step(
    mesh: Mesh, config: LlamaConfig, params_example: Any, max_seqlen_q: int, forward,
    kv_specs: tuple | None = None, lora_example: Any = None,
):
    """Shared builder for the ragged-token TP steps (prefill / verify).

    Prefill batches are ragged (cu_seqlens); for simplicity the token
    stream is replicated across the "data" axis and sharded over "model"
    only. (Data-parallel prefill = separate engine shards per host.)
    With ``lora_example``, the step takes trailing ``(lora, lora_ids)``.
    """
    k_spec, v_spec = kv_specs or (kv_cache_pspec(), kv_cache_pspec())
    param_specs = llama_param_pspecs(params_example)
    gather_logits = _has_sharded_head(params_example)

    def local_step(params, token_ids, positions, cu_seqlens_q, seq_lens, block_tables, slot_mapping, k_caches, v_caches, *lora_args):
        lora_kw = (
            {"lora": lora_args[0], "lora_ids": lora_args[1]} if lora_args else {}
        )
        logits, k_caches, v_caches = forward(
            params, config, token_ids, positions, cu_seqlens_q, max_seqlen_q,
            seq_lens, block_tables, slot_mapping, k_caches, v_caches, tp_axis="model",
            **lora_kw,
        )
        if gather_logits:
            logits = jax.lax.all_gather(logits, "model", axis=1, tiled=True)
        return logits, k_caches, v_caches

    extra_specs = () if lora_example is None else (lora_pspecs(lora_example), P())
    shard_mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(param_specs, P(), P(), P(), P(), P(), P(), k_spec, v_spec, *extra_specs),
        out_specs=(P(), k_spec, v_spec),
        check_vma=False,
    )
    return jax.jit(shard_mapped, donate_argnums=(7, 8))


def make_tp_prefill(
    mesh: Mesh, config: Any, params_example: Any, max_seqlen_q: int,
    prefill_fn=llama_prefill, kv_specs: tuple | None = None, lora_example: Any = None,
):
    """Build a jitted tensor-parallel prefill (batch replicated across data).

    ``prefill_fn`` swaps the model family (``moe.mixtral_prefill`` for
    Mixtral)."""
    return _make_tp_varlen_step(
        mesh, config, params_example, max_seqlen_q, prefill_fn, kv_specs=kv_specs,
        lora_example=lora_example,
    )


def make_tp_verify(
    mesh: Mesh, config: Any, params_example: Any, max_seqlen_q: int,
    verify_fn=llama_verify_forward, kv_specs: tuple | None = None, lora_example: Any = None,
):
    """Tensor-parallel speculative-decoding verification forward.

    ``verify_fn`` swaps the model family (``gemma.gemma_verify_forward``,
    ``moe.mixtral_verify_forward``, ...).
    """
    return _make_tp_varlen_step(
        mesh, config, params_example, max_seqlen_q, verify_fn, kv_specs=kv_specs,
        lora_example=lora_example,
    )


def make_multi_step_scan(
    decode_with_config, k: int, page_size: int, max_batch_size: int, greedy_fn,
    ring_tokens: int = 0,
):
    """Shared K-iteration greedy decode scan (single-device AND TP bodies).

    ``decode_with_config(params, tokens, positions, seq_lens, bt, slots,
    kc, vc, *lora_args) -> (logits, kc, vc)``; ``greedy_fn(logits) ->
    (batch,) int32``. The returned ``multi`` accepts optional trailing
    ``(lora, lora_ids)`` args, constant across the K iterations (a
    decode row keeps its adapter for the whole scan).
    Semantics shared by both callers:
    - seq_lens CLAMP at each sequence's owned pages (``limit``): overshoot
      iterations past a finish/page-cap must not walk the block table out
      of bounds (an unbounded page DMA on real hardware);
    - writes past the owned pages mask their slot to -1 (skip);
    - idle rows (``~active``) run with seq_len 0 / slot -1;
    - ``ring_tokens > 0`` (rolling KV): write slots wrap at the ring
      (position p -> table page (p % ring_tokens)//page_size); the
      engine passes an unbounded ``limit`` for fully-grown rings.
    """
    rows = jnp.arange(max_batch_size)

    def multi(params, tokens0, positions0, active, limit, bt, k_caches, v_caches, *lora_args):
        def body(carry, _):
            tokens, positions, kc, vc = carry
            seq_lens = jnp.where(active, jnp.minimum(positions + 1, limit), 0)
            wpos = positions % ring_tokens if ring_tokens > 0 else positions
            slots = bt[rows, wpos // page_size] * page_size + wpos % page_size
            slots = jnp.where(active & (positions < limit), slots, -1)
            logits, kc, vc = decode_with_config(
                params, tokens, positions, seq_lens, bt, slots, kc, vc, *lora_args
            )
            nxt = greedy_fn(logits)
            return (nxt, positions + 1, kc, vc), nxt

        (_, _, k_caches, v_caches), toks = jax.lax.scan(
            body, (tokens0, positions0, k_caches, v_caches), None, length=k
        )
        return toks, k_caches, v_caches

    return multi


def make_tp_multi_decode_step(
    mesh: Mesh, config: Any, params_example: Any, k: int, decode_fn=llama_decode_step,
    page_size: int = 16, max_batch_size: int = 8, ring_tokens: int = 0,
    kv_specs: tuple | None = None, lora_example: Any = None,
):
    """K greedy decode iterations in one dispatch under tensor parallelism.

    Same contract as the engine's single-device multi-step scan (argmax
    token feedback, overshoot handled by the host): returns
    ``(toks (k, batch), k_caches, v_caches)``. Greedy selection over a
    vocab-column-sharded head avoids gathering full logits every
    iteration — each chip reduces to its local (max, argmax) and two
    (batch,)-sized all-gathers pick the global winner (column shards are
    concatenated in axis order, so global id = local id + chip offset).
    """
    param_specs = llama_param_pspecs(params_example)
    gather = _has_sharded_head(params_example)

    def greedy(logits):
        if not gather:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        local_vocab = logits.shape[-1]
        offset = jax.lax.axis_index("model") * local_vocab
        local_max = jnp.max(logits, axis=-1)
        local_arg = (jnp.argmax(logits, axis=-1) + offset).astype(jnp.int32)
        all_max = jax.lax.all_gather(local_max, "model")  # (n, b)
        all_arg = jax.lax.all_gather(local_arg, "model")
        best = jnp.argmax(all_max, axis=0)
        return jnp.take_along_axis(all_arg, best[None], axis=0)[0]

    def decode_with_config(params, tokens, positions, seq_lens, bt, slots, kc, vc, *lora_args):
        lora_kw = (
            {"lora": lora_args[0], "lora_ids": lora_args[1]} if lora_args else {}
        )
        return decode_fn(
            params, config, tokens, positions, seq_lens, bt, slots, kc, vc,
            tp_axis="model", **lora_kw,
        )

    local_step = make_multi_step_scan(
        decode_with_config, k, page_size, max_batch_size, greedy, ring_tokens=ring_tokens
    )

    k_spec, v_spec = kv_specs or (kv_cache_pspec(), kv_cache_pspec())
    extra_specs = () if lora_example is None else (lora_pspecs(lora_example), P())
    shard_mapped = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(param_specs, P(), P(), P(), P(), P(), k_spec, v_spec, *extra_specs),
        out_specs=(P(), k_spec, v_spec),
        check_vma=False,
    )
    return jax.jit(shard_mapped, donate_argnums=(6, 7))
