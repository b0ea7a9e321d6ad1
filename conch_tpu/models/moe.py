# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Mixture-of-Experts layer + Mixtral-family model (TPU-native MoE).

Design (GShard/Switch-style, re-thought for the MXU rather than ported):
token routing is expressed as *dense einsums* over a static-capacity
dispatch tensor — no scatter, no sorting networks, no dynamic shapes.
Every FLOP lands on the MXU as a batched (E, C, H) x (E, H, F) matmul,
and expert parallelism is a plain sharding of the leading expert axis
(`parallel/sharding.py::shard_moe_params`), letting GSPMD insert the
collectives.

Dropping policy: each expert processes at most ``capacity`` tokens per
step; overflow tokens fall through the residual connection (standard
GShard semantics). Serving-path callers size ``capacity`` at
``ceil(T * top_k / E * capacity_factor)``; tests use capacity == T so the
einsum formulation can be checked exactly against a naive per-token
reference.

Reference parity note: stackav-oss/conch has no MoE — this extends the
model zoo toward the Mixtral family the north-star serving stack needs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.models.linear import QuantizedLinear, quantize_linear
from conch_tpu.models.llama import LlamaConfig, _kv_cache_quant, _layer_step_factory, _split_heavy
from conch_tpu.ops.attention import paged_attention, varlen_attention
from conch_tpu.ops.normalization import rms_norm
from conch_tpu.reference.embedding.rotary_embedding import compute_cos_sin_cache


@dataclass(frozen=True)
class MoEConfig:
    """Mixtral-style decoder config: Llama attention + sparse MoE MLP."""

    llama: LlamaConfig = LlamaConfig()
    num_experts: int = 8
    top_k: int = 2
    capacity_factor: float = 2.0

    @staticmethod
    def mixtral_8x7b() -> "MoEConfig":
        return MoEConfig(
            llama=LlamaConfig(
                vocab_size=32000,
                hidden_size=4096,
                intermediate_size=14336,
                num_layers=32,
                num_heads=32,
                num_kv_heads=8,
                head_dim=128,
                rope_theta=1e6,
                max_position=32768,
            ),
            num_experts=8,
            top_k=2,
        )

    @staticmethod
    def tiny(**overrides) -> "MoEConfig":
        llama_keys = {k: overrides.pop(k) for k in list(overrides) if hasattr(LlamaConfig(), k)}
        return MoEConfig(llama=LlamaConfig(**llama_keys), **overrides)

    def capacity(self, num_tokens: int) -> int:
        """Static per-expert token capacity for a batch of ``num_tokens``."""
        cap = math.ceil(num_tokens * self.top_k / self.num_experts * self.capacity_factor)
        return max(1, min(cap, num_tokens))

    # Engine-facing attributes (LLMEngine sizes the KV pool off the model
    # config; MoE attention geometry is the inner Llama config's).
    @property
    def num_layers(self) -> int:
        return self.llama.num_layers

    @property
    def num_kv_heads(self) -> int:
        return self.llama.num_kv_heads

    @property
    def head_dim(self) -> int:
        return self.llama.head_dim

    @property
    def dtype(self):
        return self.llama.dtype


def route_topk(router_logits: jax.Array, top_k: int) -> tuple[jax.Array, jax.Array]:
    """Top-k routing with Mixtral's renormalized softmax.

    Returns (weights (T, k) float32 summing to 1 per token, experts (T, k) int32).
    """
    vals, idx = jax.lax.top_k(router_logits.astype(jnp.float32), top_k)
    weights = jax.nn.softmax(vals, axis=-1)
    return weights, idx


def make_dispatch(
    weights: jax.Array,  # (T, k) f32
    experts: jax.Array,  # (T, k) i32
    num_experts: int,
    capacity: int,
) -> tuple[jax.Array, jax.Array]:
    """Build the (T, E, C) dispatch one-hot and combine tensors.

    Position-in-expert is an exclusive cumsum of each expert's selection
    mask over tokens (earlier tokens win capacity, matching GShard).
    k-slots are ranked in order: a token's second-choice expert sees it
    after every token's first choice at that expert.
    """
    t = weights.shape[0]
    dispatch = jnp.zeros((t, num_experts, capacity), jnp.float32)
    combine = jnp.zeros((t, num_experts, capacity), jnp.float32)
    # Tokens already admitted per expert from earlier k-slots.
    base_count = jnp.zeros((num_experts,), jnp.int32)
    for slot in range(weights.shape[1]):
        mask = jax.nn.one_hot(experts[:, slot], num_experts, dtype=jnp.int32)  # (T, E)
        pos = jnp.cumsum(mask, axis=0) - mask + base_count[None, :]  # exclusive, (T, E)
        keep = mask * (pos < capacity)
        pos_onehot = jax.nn.one_hot(jnp.sum(pos * keep, axis=1), capacity, dtype=jnp.float32)
        sel = keep.astype(jnp.float32)  # (T, E)
        dispatch = dispatch + sel[:, :, None] * pos_onehot[:, None, :]
        combine = combine + (sel * weights[:, slot:slot + 1])[:, :, None] * pos_onehot[:, None, :]
        base_count = base_count + jnp.sum(keep, axis=0)
    return dispatch, combine


def moe_ffn(
    hidden: jax.Array,  # (T, H)
    router_w: jax.Array,  # (H, E_global)
    w_gate: jax.Array,  # (E_local, H, F)
    w_up: jax.Array,  # (E_local, H, F)
    w_down: jax.Array,  # (E_local, F, H)
    top_k: int,
    capacity: int,
    ep_axis: str | None = None,
    routing: tuple[jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """Sparse SwiGLU MoE feed-forward as dense batched einsums.

    dispatch: (T,E,C)x(T,H)->(E,C,H); experts: batched SwiGLU on the MXU;
    combine: (T,E,C)x(E,C,H)->(T,H). Expert parallelism, two ways:

    - GSPMD: pass globally-shaped ``w_*`` sharded on the expert axis
      (``parallel/sharding.py``); XLA keeps expert compute local and
      all-reduces the combine contraction.
    - shard_map: pass ``ep_axis`` — ``w_*`` are the *local* expert shard,
      the routing/dispatch math is computed (replicated) for all global
      experts, each chip slices its expert range, and the partial combine
      is ``psum``-reduced over ``ep_axis``.

    The expert activation is plain jnp (not the Pallas fused kernel): XLA
    fuses the elementwise SwiGLU into the surrounding batched matmuls, and
    jnp keeps the einsums GSPMD-partitionable.
    """
    compute_dtype = hidden.dtype
    num_global = router_w.shape[1]
    if routing is None:
        logits = hidden.astype(jnp.float32) @ router_w.astype(jnp.float32)
        routing = route_topk(logits, top_k)
    weights, experts = routing
    dispatch, combine = make_dispatch(weights, experts, num_global, capacity)

    if ep_axis is not None:
        num_local = w_gate.shape[0]
        offset = jax.lax.axis_index(ep_axis) * num_local
        dispatch = jax.lax.dynamic_slice_in_dim(dispatch, offset, num_local, axis=1)
        combine = jax.lax.dynamic_slice_in_dim(combine, offset, num_local, axis=1)

    x = jnp.einsum("tec,th->ech", dispatch.astype(compute_dtype), hidden)
    gate = jnp.einsum("ech,ehf->ecf", x, w_gate)
    up = jnp.einsum("ech,ehf->ecf", x, w_up)
    act = (jax.nn.silu(gate.astype(jnp.float32)) * up.astype(jnp.float32)).astype(compute_dtype)
    y = jnp.einsum("ecf,efh->ech", act, w_down)
    out = jnp.einsum("tec,ech->th", combine.astype(compute_dtype), y)
    if ep_axis is not None:
        out = jax.lax.psum(out, ep_axis)
    return out


def moe_ffn_reference(
    hidden: jax.Array,
    router_w: jax.Array,
    w_gate: jax.Array,
    w_up: jax.Array,
    w_down: jax.Array,
    top_k: int,
) -> jax.Array:
    """Naive per-token oracle (no capacity drops) for parity tests."""
    logits = np.asarray(hidden, np.float32) @ np.asarray(router_w, np.float32)
    out = np.zeros_like(np.asarray(hidden, np.float32))
    wg, wu, wd = (np.asarray(w, np.float32) for w in (w_gate, w_up, w_down))
    for t in range(hidden.shape[0]):
        order = np.argsort(-logits[t])[:top_k]
        sel = np.exp(logits[t][order] - logits[t][order].max())
        sel = sel / sel.sum()
        x = np.asarray(hidden[t], np.float32)
        for w, e in zip(sel, order):
            g = x @ wg[e]
            u = x @ wu[e]
            act = g / (1 + np.exp(-g)) * u
            out[t] += w * (act @ wd[e])
    return jnp.asarray(out, hidden.dtype)


def load_balance_loss(router_logits: jax.Array, experts: jax.Array, num_experts: int) -> jax.Array:
    """Switch-Transformer auxiliary load-balancing loss (for training)."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    frac_tokens = jnp.mean(
        jax.nn.one_hot(experts[:, 0], num_experts, dtype=jnp.float32), axis=0
    )
    frac_probs = jnp.mean(probs, axis=0)
    return num_experts * jnp.sum(frac_tokens * frac_probs)


def init_moe_params(
    seed: int, config: MoEConfig, quant_mode: str = "bf16", group_size: int = 128
) -> dict:
    """Random-init Mixtral params: Llama attention weights + per-layer MoE.

    Expert weights are dense (E, H, F) stacks — quantized expert storage
    rides the same per-expert QuantizedLinear layout when needed; the
    attention projections honor ``quant_mode`` exactly like Llama.
    """
    c = config.llama
    rng = np.random.default_rng(seed)
    h, inter = c.hidden_size, c.intermediate_size
    q_dim = c.num_heads * c.head_dim
    kv_dim = c.num_kv_heads * c.head_dim
    std = 0.02

    def make_proj(k_dim: int, n_dim: int) -> QuantizedLinear:
        w = rng.standard_normal((k_dim, n_dim), dtype=np.float32) * std
        kwargs = {"group_size": group_size} if quant_mode in ("int4", "int8") else {}
        return quantize_linear(w, quant_mode, **kwargs)

    def make_layer():
        return {
            "wq": make_proj(h, q_dim),
            "wk": make_proj(h, kv_dim),
            "wv": make_proj(h, kv_dim),
            "wo": make_proj(q_dim, h),
            "router": jnp.asarray(rng.normal(size=(h, config.num_experts)) * std, jnp.float32),
            "w_gate": jnp.asarray(rng.normal(size=(config.num_experts, h, inter)) * std, c.dtype),
            "w_up": jnp.asarray(rng.normal(size=(config.num_experts, h, inter)) * std, c.dtype),
            "w_down": jnp.asarray(rng.normal(size=(config.num_experts, inter, h)) * std, c.dtype),
            "input_norm": jnp.ones((h,), dtype=c.dtype),
            "post_attn_norm": jnp.ones((h,), dtype=c.dtype),
        }

    layers = [make_layer() for _ in range(c.num_layers)]
    return {
        "embedding": jnp.asarray(rng.standard_normal((c.vocab_size, h), dtype=np.float32) * std, dtype=c.dtype),
        "layers": jax.tree.map(lambda *xs: jnp.stack(xs), *layers),
        "final_norm": jnp.ones((h,), dtype=c.dtype),
        "lm_head": quantize_linear(
            rng.standard_normal((h, c.vocab_size), dtype=np.float32) * std, "bf16"
        ),
        "cos_sin_cache": compute_cos_sin_cache(
            c.rope_theta, c.head_dim, c.max_position, rope_scaling=c.rope_scaling_dict()
        ),
    }


def _moe_mlp_fn(config: MoEConfig, capacity: int, tp_axis: str | None):
    def mlp_fn(layer: dict, mlp_in: jax.Array) -> jax.Array:
        return moe_ffn(
            mlp_in, layer["router"], layer["w_gate"], layer["w_up"], layer["w_down"],
            config.top_k, capacity, ep_axis=tp_axis,
        )

    return mlp_fn


def mixtral_decode_step(
    params: dict,
    config: MoEConfig,
    token_ids: jax.Array,
    positions: jax.Array,
    seq_lens: jax.Array,
    block_tables: jax.Array,
    slot_mapping: jax.Array,
    k_caches: jax.Array,
    v_caches: jax.Array,
    tp_axis: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One decode step; same contract as ``llama_decode_step``."""
    c = config.llama
    hidden = jnp.take(params["embedding"], token_ids, axis=0)
    num_kv_heads = k_caches.shape[2]
    group = c.num_heads // c.num_kv_heads
    kv_quant = _kv_cache_quant(c, k_caches.dtype)

    def attn_fn(q, k_caches, v_caches, l_idx):
        return paged_attention(
            q, k_caches, v_caches, block_tables, seq_lens,
            kv_cache_dtype=kv_quant[0], k_scale=kv_quant[1], v_scale=kv_quant[1],
            window_size=c.sliding_window,
            layer_idx=l_idx,
        )

    heavy, light = _split_heavy(params["layers"])
    layer_step = _layer_step_factory(
        c, attn_fn, params["cos_sin_cache"], positions, slot_mapping,
        tp_axis=tp_axis, num_heads=num_kv_heads * group, num_kv_heads=num_kv_heads,
        kv_quant=kv_quant,
        mlp_fn=_moe_mlp_fn(config, config.capacity(token_ids.shape[0]), tp_axis),
        heavy=heavy,
    )
    layer_ids = jnp.arange(k_caches.shape[0], dtype=jnp.int32)
    (hidden, k_caches, v_caches), _ = jax.lax.scan(
        layer_step, (hidden, k_caches, v_caches), (light, layer_ids)
    )

    hidden = rms_norm(hidden, params["final_norm"], c.rms_norm_eps)
    logits = params["lm_head"].apply(hidden)
    return logits.astype(jnp.float32), k_caches, v_caches


def mixtral_prefill(
    params: dict,
    config: MoEConfig,
    token_ids: jax.Array,
    positions: jax.Array,
    cu_seqlens_q: jax.Array,
    max_seqlen_q: int,
    seq_lens: jax.Array,
    block_tables: jax.Array,
    slot_mapping: jax.Array,
    k_caches: jax.Array,
    v_caches: jax.Array,
    tp_axis: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Prefill forward; same contract as ``llama_prefill``."""
    c = config.llama
    hidden = jnp.take(params["embedding"], token_ids, axis=0)
    num_kv_heads = k_caches.shape[2]
    group = c.num_heads // c.num_kv_heads
    kv_quant = _kv_cache_quant(c, k_caches.dtype)

    def attn_fn(q, k_caches, v_caches, l_idx):
        return varlen_attention(
            q, k_caches, v_caches, cu_seqlens_q, max_seqlen_q, seq_lens,
            max_seqlen_q, block_tables, causal=True,
            kv_cache_dtype=kv_quant[0], k_scale=kv_quant[1], v_scale=kv_quant[1],
            window_size=c.sliding_window,
            layer_idx=l_idx,
        )

    heavy, light = _split_heavy(params["layers"])
    layer_step = _layer_step_factory(
        c, attn_fn, params["cos_sin_cache"], positions, slot_mapping,
        tp_axis=tp_axis, num_heads=num_kv_heads * group, num_kv_heads=num_kv_heads,
        kv_quant=kv_quant,
        mlp_fn=_moe_mlp_fn(config, config.capacity(token_ids.shape[0]), tp_axis),
        cache_mode="scatter",
        heavy=heavy,
    )
    layer_ids = jnp.arange(k_caches.shape[0], dtype=jnp.int32)
    (hidden, k_caches, v_caches), _ = jax.lax.scan(
        layer_step, (hidden, k_caches, v_caches), (light, layer_ids)
    )

    last_rows = cu_seqlens_q[1:] - 1
    hidden_last = jnp.take(hidden, last_rows, axis=0)
    hidden_last = rms_norm(hidden_last, params["final_norm"], c.rms_norm_eps)
    logits = params["lm_head"].apply(hidden_last)
    return logits.astype(jnp.float32), k_caches, v_caches


def mixtral_verify_forward(
    params: dict,
    config: MoEConfig,
    token_ids: jax.Array,
    positions: jax.Array,
    cu_seqlens_q: jax.Array,
    max_seqlen_q: int,
    seq_lens: jax.Array,
    block_tables: jax.Array,
    slot_mapping: jax.Array,
    k_caches: jax.Array,
    v_caches: jax.Array,
    tp_axis: str | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Speculative-decoding verification: ``mixtral_prefill`` but with
    logits for EVERY query token (same contract as
    ``llama_verify_forward``; rejected positions need no KV rollback).
    """
    c = config.llama
    hidden = jnp.take(params["embedding"], token_ids, axis=0)
    num_kv_heads = k_caches.shape[2]
    group = c.num_heads // c.num_kv_heads
    kv_quant = _kv_cache_quant(c, k_caches.dtype)

    def attn_fn(q, k_caches, v_caches, l_idx):
        return varlen_attention(
            q, k_caches, v_caches, cu_seqlens_q, max_seqlen_q, seq_lens,
            max_seqlen_q, block_tables, causal=True,
            kv_cache_dtype=kv_quant[0], k_scale=kv_quant[1], v_scale=kv_quant[1],
            window_size=c.sliding_window,
            layer_idx=l_idx,
        )

    heavy, light = _split_heavy(params["layers"])
    layer_step = _layer_step_factory(
        c, attn_fn, params["cos_sin_cache"], positions, slot_mapping,
        tp_axis=tp_axis, num_heads=num_kv_heads * group, num_kv_heads=num_kv_heads,
        kv_quant=kv_quant,
        mlp_fn=_moe_mlp_fn(config, config.capacity(token_ids.shape[0]), tp_axis),
        cache_mode="scatter",
        heavy=heavy,
    )
    layer_ids = jnp.arange(k_caches.shape[0], dtype=jnp.int32)
    (hidden, k_caches, v_caches), _ = jax.lax.scan(
        layer_step, (hidden, k_caches, v_caches), (light, layer_ids)
    )

    hidden = rms_norm(hidden, params["final_norm"], c.rms_norm_eps)
    logits = params["lm_head"].apply(hidden)
    return logits.astype(jnp.float32), k_caches, v_caches


def init_moe_kv_caches(config: MoEConfig, num_pages: int, page_size: int, cache_dtype=None):
    from conch_tpu.models.llama import init_kv_caches

    return init_kv_caches(config.llama, num_pages, page_size, cache_dtype)


def moe_dense_forward(params: dict, config: MoEConfig, token_ids: jax.Array, remat: bool = False):
    """Full-context training forward; returns (logits, aux_loss).

    Dense attention (whole sequences, no paged cache) + the einsum MoE
    feed-forward in GSPMD mode: shard the batch over "data" and the
    (L, E, ...) expert stacks over "model" (``parallel/sharding.py``) and
    XLA keeps expert compute local, all-reducing only the combine
    contraction. ``aux_loss`` is the mean Switch load-balance loss over
    layers (router collapse regularizer).
    """
    c = config.llama
    b, t = token_ids.shape
    h = c.hidden_size
    hidden = jnp.take(params["embedding"], token_ids, axis=0).astype(jnp.float32)

    def norm(x, w):
        ms = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + c.rms_norm_eps)) * w.astype(jnp.float32)

    capacity = config.capacity(b * t)

    def layer_step(carry, layer):
        hidden, aux = carry
        x = norm(hidden, layer["input_norm"]).astype(c.dtype)
        flat = x.reshape(b * t, h)
        # Attention (dense causal), same math as parallel/train.py.
        from conch_tpu.reference.embedding.rotary_embedding import rotary_embedding as rope_apply

        positions = jnp.arange(t, dtype=jnp.int32)
        q = layer["wq"].apply(flat)
        k = layer["wk"].apply(flat)
        v = layer["wv"].apply(flat)
        q, k = rope_apply(jnp.tile(positions, b), q, k, params["cos_sin_cache"], c.head_dim, c.head_dim)
        qh = q.reshape(b, t, c.num_heads, c.head_dim).astype(jnp.float32)
        kh = k.reshape(b, t, c.num_kv_heads, c.head_dim).astype(jnp.float32)
        vh = v.reshape(b, t, c.num_kv_heads, c.head_dim).astype(jnp.float32)
        group = c.num_heads // c.num_kv_heads
        kh = jnp.repeat(kh, group, axis=2)
        vh = jnp.repeat(vh, group, axis=2)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / math.sqrt(float(c.head_dim))
        causal = jnp.tril(jnp.ones((t, t), bool))
        if c.sliding_window > 0:
            causal &= ~jnp.tril(jnp.ones((t, t), bool), -c.sliding_window)
        s = jnp.where(causal[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b * t, -1).astype(c.dtype)
        hidden = hidden + layer["wo"].apply(attn).reshape(b, t, h).astype(jnp.float32)

        # MoE half: route once — feed the same (weights, experts) to the
        # dispatch AND the load-balance aux.
        x = norm(hidden, layer["post_attn_norm"]).astype(c.dtype).reshape(b * t, h)
        router_logits = x.astype(jnp.float32) @ layer["router"].astype(jnp.float32)
        routing = route_topk(router_logits, config.top_k)
        aux = aux + load_balance_loss(router_logits, routing[1], config.num_experts)
        delta = moe_ffn(
            x, layer["router"], layer["w_gate"], layer["w_up"], layer["w_down"],
            top_k=config.top_k, capacity=capacity, routing=routing,
        )
        hidden = hidden + delta.reshape(b, t, h).astype(jnp.float32)
        return (hidden, aux), None

    step = jax.checkpoint(layer_step) if remat else layer_step
    (hidden, aux), _ = jax.lax.scan(step, (hidden, jnp.float32(0.0)), params["layers"])
    hidden = norm(hidden, params["final_norm"]).astype(c.dtype)
    logits = params["lm_head"].apply(hidden.reshape(b * t, h))
    return logits.reshape(b, t, -1).astype(jnp.float32), aux / config.llama.num_layers


def make_moe_train_step(mesh, config: MoEConfig, params_example, learning_rate: float = 1e-3, aux_coef: float = 0.01, remat: bool = False):
    """GSPMD Mixtral training step: batch over "data", experts (and
    attention heads) over "model"; loss = next-token CE + aux_coef x
    load-balance. Returns (train_step, init_opt_state, batch_sharding)."""
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from conch_tpu.parallel.sharding import llama_param_shardings

    optimizer = optax.adamw(learning_rate)
    param_shardings = llama_param_shardings(params_example, mesh)
    batch_sharding = NamedSharding(mesh, P("data", None))

    def loss_fn(params, token_ids):
        logits, aux = moe_dense_forward(params, config, token_ids, remat=remat)
        targets = token_ids[:, 1:]
        log_probs = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
        return jnp.mean(nll) + aux_coef * aux

    def init_opt_state(params):
        return optimizer.init(params)

    def train_step(params, opt_state, token_ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, token_ids)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    jitted = jax.jit(
        train_step,
        in_shardings=(param_shardings, None, batch_sharding),
        out_shardings=(param_shardings, None, None),
        donate_argnums=(0, 1),
    )
    return jitted, init_opt_state, batch_sharding
