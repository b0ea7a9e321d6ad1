# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Gemma-family transformer (second model family on the op library).

Differences from Llama, all exercised through conch_tpu ops:

- Gemma RMS norm (fp32 end-to-end, ``(1 + w)`` weighting) —
  ``ops.normalization.gemma_rms_norm``;
- GeGLU MLP (tanh-approximate GeLU gate) —
  ``ops.activation.gelu_tanh_and_mul_parts``;
- embedding scaling by sqrt(hidden_size);
- optional attention logit softcapping (Gemma-2 style) — flows into the
  paged/varlen attention kernels' ``softcap`` path;
- tied embedding / lm-head weights.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.models.linear import QuantizedLinear, quantize_linear
from conch_tpu.ops.activation import gelu_tanh_and_mul, gelu_tanh_and_mul_parts
from conch_tpu.ops.attention import paged_attention, varlen_attention
from conch_tpu.models.llama import _kv_cache_quant, _split_heavy
from conch_tpu.ops.cache import reshape_and_cache
from conch_tpu.ops.embedding import rotary_embedding
from conch_tpu.ops.normalization import gemma_rms_norm
from conch_tpu.reference.embedding.rotary_embedding import compute_cos_sin_cache


@dataclass(frozen=True)
class GemmaConfig:
    """Gemma hyperparameters (defaults: a tiny debug model)."""

    vocab_size: int = 256
    hidden_size: int = 256
    intermediate_size: int = 512
    num_layers: int = 2
    num_heads: int = 4
    num_kv_heads: int = 1
    head_dim: int = 64
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-6
    max_position: int = 8192
    attn_logit_softcap: float = 0.0
    final_logit_softcap: float = 0.0
    query_pre_attn_scalar: float | None = None  # defaults to head_dim
    # Gemma-2: alternating local(window)/global attention layers +
    # sandwich norms (post-attention and post-feedforward norms applied
    # to each block's OUTPUT before the residual add). Requires an even
    # num_layers; even layer indices are the sliding-window layers
    # (HF Gemma2 convention).
    gemma2: bool = False
    sliding_window: int = 0
    dtype: Any = jnp.bfloat16
    # Static per-tensor scale for quantized (int8/fp8) KV caches (see
    # conch_tpu.models.llama._kv_cache_quant).
    kv_cache_scale: float = 1.0 / 16

    def __post_init__(self):
        if self.gemma2:
            if self.sliding_window <= 0:
                msg = "gemma2=True requires a positive sliding_window (the local layers)"
                raise ValueError(msg)
            if self.num_layers % 2 != 0:
                msg = "gemma2 alternation needs an even num_layers"
                raise ValueError(msg)

    @staticmethod
    def gemma2_2b() -> "GemmaConfig":
        return GemmaConfig(
            vocab_size=256128,
            hidden_size=2304,
            intermediate_size=9216,
            num_layers=26,
            num_heads=8,
            num_kv_heads=4,
            head_dim=256,
            attn_logit_softcap=50.0,
            final_logit_softcap=30.0,
            query_pre_attn_scalar=256.0,
            gemma2=True,
            sliding_window=4096,
        )


def init_gemma_params(seed: int, config: GemmaConfig, quant_mode: str = "bf16", group_size: int = 128) -> dict:
    """Random-initialize Gemma params (embedding tied to lm head)."""
    rng = np.random.default_rng(seed)
    h, inter = config.hidden_size, config.intermediate_size
    q_dim = config.num_heads * config.head_dim
    kv_dim = config.num_kv_heads * config.head_dim
    std = 0.02

    def make_proj(k_dim: int, n_dim: int) -> QuantizedLinear:
        w = rng.normal(size=(k_dim, n_dim)).astype(np.float32) * std
        kwargs = {"group_size": group_size} if quant_mode in ("int4", "int8") else {}
        return quantize_linear(w, quant_mode, **kwargs)

    def stack_layers(make_fn):
        layers = [make_fn() for _ in range(config.num_layers)]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)

    def make_layer():
        layer = {
            "wq": make_proj(h, q_dim),
            "wk": make_proj(h, kv_dim),
            "wv": make_proj(h, kv_dim),
            "wo": make_proj(q_dim, h),
            "w_gate": make_proj(h, inter),
            "w_up": make_proj(h, inter),
            "w_down": make_proj(inter, h),
            "input_norm": jnp.zeros((h,), dtype=config.dtype),  # Gemma: (1 + w)
            "post_attn_norm": jnp.zeros((h,), dtype=config.dtype),
        }
        if config.gemma2:  # sandwich norms around the MLP block too
            layer["pre_ff_norm"] = jnp.zeros((h,), dtype=config.dtype)
            layer["post_ff_norm"] = jnp.zeros((h,), dtype=config.dtype)
        return layer

    layer_params = stack_layers(make_layer)

    embedding = jnp.asarray(rng.normal(size=(config.vocab_size, h)) * std, dtype=config.dtype)
    return {
        "embedding": embedding,  # tied: logits = hidden @ embedding.T
        "layers": layer_params,
        "final_norm": jnp.zeros((config.hidden_size,), dtype=config.dtype),
        "cos_sin_cache": compute_cos_sin_cache(config.rope_theta, config.head_dim, config.max_position),
    }


def init_gemma_kv_caches(config: GemmaConfig, num_pages: int, page_size: int, cache_dtype=None):
    cache_dtype = cache_dtype or config.dtype
    shape = (config.num_layers, num_pages, config.num_kv_heads, page_size, config.head_dim)
    return jnp.zeros(shape, dtype=cache_dtype), jnp.zeros(shape, dtype=cache_dtype)


def _gemma_layers(config: GemmaConfig, params, hidden, positions, slot_mapping, attn_fn, k_caches, v_caches, tp_axis=None, kv_quant=("auto", None), attn_fn_local=None):
    eps = config.rms_norm_eps
    num_kv_heads = k_caches.shape[2]
    group = config.num_heads // config.num_kv_heads
    num_heads = num_kv_heads * group
    q_dim = num_heads * config.head_dim
    kv_dim = num_kv_heads * config.head_dim

    # Heavy QuantizedLinear stacks ride OUTSIDE the scan and are indexed
    # by the GEMM scalar-prefetch layer index (same mechanism as
    # models.llama: scanning them as xs makes XLA materialize a copy of
    # every weight per layer per step). Fused wqkv / w_gateup stacks
    # (fuse_llama_params works on Gemma layer dicts too) are sliced at
    # the GEMM output.
    heavy, light = _split_heavy(params["layers"])

    def reduce_tp(x):
        return jax.lax.psum(x, tp_axis) if tp_axis else x

    def make_proj(layer, l_idx):
        def proj(name, x):
            if heavy is not None and name in heavy:
                return heavy[name].apply_stacked(x, l_idx)
            return layer[name].apply(x)

        def has(name):
            return (heavy is not None and name in heavy) or name in layer

        return proj, has

    def attend(hidden, layer, l_idx, k_cache, v_cache, fn):
        """Attention half up to (pre-residual) projected output."""
        t = hidden.shape[0]
        proj, has = make_proj(layer, l_idx)
        attn_in = gemma_rms_norm(hidden, layer["input_norm"], eps)
        if has("wqkv"):
            qkv = proj("wqkv", attn_in)
            q = qkv[:, :q_dim]
            k = qkv[:, q_dim : q_dim + kv_dim]
            v = qkv[:, q_dim + kv_dim :]
        else:
            q = proj("wq", attn_in)
            k = proj("wk", attn_in)
            v = proj("wv", attn_in)
        q, k = rotary_embedding(positions, q, k, config.head_dim, params["cos_sin_cache"])

        k = k.reshape(t, num_kv_heads, config.head_dim)
        v = v.reshape(t, num_kv_heads, config.head_dim)
        kv_dtype, kv_scale = kv_quant
        k_cache, v_cache = reshape_and_cache(
            k, v, k_cache, v_cache, slot_mapping,
            kv_cache_dtype=kv_dtype, k_scale=kv_scale, v_scale=kv_scale,
        )
        attn_out = fn(q.reshape(t, num_heads, config.head_dim), k_cache, v_cache)
        return reduce_tp(proj("wo", attn_out.reshape(t, -1))), k_cache, v_cache

    def mlp(x, layer, l_idx):
        proj, has = make_proj(layer, l_idx)
        if has("w_gateup"):
            act = gelu_tanh_and_mul(proj("w_gateup", x))
        else:
            act = gelu_tanh_and_mul_parts(proj("w_gate", x), proj("w_up", x))
        return reduce_tp(proj("w_down", act))

    if config.gemma2:
        # Gemma-2: sandwich norms + alternating local/global attention,
        # scanned over layer PAIRS (even layer = sliding window, odd =
        # global — the window is a static kernel parameter, so the two
        # sub-layers are distinct attention calls in one scan body).
        assert config.num_layers % 2 == 0, "gemma2 alternation needs even num_layers"
        assert attn_fn_local is not None

        def sub_layer(hidden, layer, l_idx, k_cache, v_cache, fn):
            attn_h, k_cache, v_cache = attend(hidden, layer, l_idx, k_cache, v_cache, fn)
            hidden = hidden + gemma_rms_norm(attn_h, layer["post_attn_norm"], eps)
            mlp_in = gemma_rms_norm(hidden, layer["pre_ff_norm"], eps)
            hidden = hidden + gemma_rms_norm(mlp(mlp_in, layer, l_idx), layer["post_ff_norm"], eps)
            return hidden, k_cache, v_cache

        def pair_step(hidden, xs):
            layers2, k2, v2, pair_idx = xs  # leading dim 2: (local, global)
            l0 = jax.tree.map(lambda x: x[0], layers2)
            l1 = jax.tree.map(lambda x: x[1], layers2)
            hidden, k0, v0 = sub_layer(hidden, l0, 2 * pair_idx, k2[0], v2[0], attn_fn_local)
            hidden, k1, v1 = sub_layer(hidden, l1, 2 * pair_idx + 1, k2[1], v2[1], attn_fn)
            return hidden, (jnp.stack([k0, k1]), jnp.stack([v0, v1]))

        half = config.num_layers // 2
        layers_pairs = jax.tree.map(lambda x: x.reshape(half, 2, *x.shape[1:]), light)
        kc_pairs = k_caches.reshape(half, 2, *k_caches.shape[1:])
        vc_pairs = v_caches.reshape(half, 2, *v_caches.shape[1:])
        hidden, (kc_out, vc_out) = jax.lax.scan(
            pair_step,
            hidden,
            (layers_pairs, kc_pairs, vc_pairs, jnp.arange(half, dtype=jnp.int32)),
        )
        return hidden, (
            kc_out.reshape(config.num_layers, *k_caches.shape[1:]),
            vc_out.reshape(config.num_layers, *v_caches.shape[1:]),
        )

    def layer_step(hidden, xs):
        layer, k_cache, v_cache, l_idx = xs
        attn_h, k_cache, v_cache = attend(hidden, layer, l_idx, k_cache, v_cache, attn_fn)
        hidden = hidden + attn_h
        mlp_in = gemma_rms_norm(hidden, layer["post_attn_norm"], eps)
        hidden = hidden + mlp(mlp_in, layer, l_idx)
        return hidden, (k_cache, v_cache)

    return jax.lax.scan(
        layer_step,
        hidden,
        (light, k_caches, v_caches, jnp.arange(config.num_layers, dtype=jnp.int32)),
    )


def _final_logits(params, config: GemmaConfig, hidden: jax.Array) -> jax.Array:
    hidden = gemma_rms_norm(hidden, params["final_norm"], config.rms_norm_eps)
    logits = jnp.dot(
        hidden, params["embedding"].T.astype(hidden.dtype), preferred_element_type=jnp.float32
    )
    if config.final_logit_softcap > 0.0:
        logits = config.final_logit_softcap * jnp.tanh(logits / config.final_logit_softcap)
    return logits.astype(jnp.float32)


def _attn_scale(config: GemmaConfig) -> float:
    scalar = config.query_pre_attn_scalar or float(config.head_dim)
    return scalar**-0.5


def gemma_prefill(
    params, config: GemmaConfig, token_ids, positions, cu_seqlens_q, max_seqlen_q: int,
    seq_lens, block_tables, slot_mapping, k_caches, v_caches, tp_axis=None,
):
    """Prefill forward; returns (last-token logits, k_caches, v_caches)."""
    hidden = jnp.take(params["embedding"], token_ids, axis=0)
    hidden = hidden * jnp.asarray(config.hidden_size**0.5, hidden.dtype)

    kv_quant = _kv_cache_quant(config, k_caches.dtype)

    def make_attn(window):
        def attn_fn(q, kc, vc):
            return varlen_attention(
                q, kc, vc, cu_seqlens_q, max_seqlen_q, seq_lens, max_seqlen_q,
                block_tables, causal=True, scale=_attn_scale(config),
                softcap=config.attn_logit_softcap,
                kv_cache_dtype=kv_quant[0], k_scale=kv_quant[1], v_scale=kv_quant[1],
                window_size=window,
            )

        return attn_fn

    hidden, (k_caches, v_caches) = _gemma_layers(
        config, params, hidden, positions, slot_mapping, make_attn(0), k_caches, v_caches, tp_axis,
        kv_quant=kv_quant,
        attn_fn_local=make_attn(config.sliding_window) if config.gemma2 else None,
    )
    last_rows = cu_seqlens_q[1:] - 1
    logits = _final_logits(params, config, jnp.take(hidden, last_rows, axis=0))
    return logits, k_caches, v_caches


def gemma_verify_forward(
    params, config: GemmaConfig, token_ids, positions, cu_seqlens_q, max_seqlen_q: int,
    seq_lens, block_tables, slot_mapping, k_caches, v_caches, tp_axis=None,
):
    """Speculative-decoding verification forward: ``gemma_prefill`` but
    returning logits for EVERY query token so the engine can check each
    drafted token in one pass (KV for rejected positions needs no
    rollback — entries past ``seq_len`` are masked and overwritten).
    """
    hidden = jnp.take(params["embedding"], token_ids, axis=0)
    hidden = hidden * jnp.asarray(config.hidden_size**0.5, hidden.dtype)

    kv_quant = _kv_cache_quant(config, k_caches.dtype)

    def make_attn(window):
        def attn_fn(q, kc, vc):
            return varlen_attention(
                q, kc, vc, cu_seqlens_q, max_seqlen_q, seq_lens, max_seqlen_q,
                block_tables, causal=True, scale=_attn_scale(config),
                softcap=config.attn_logit_softcap,
                kv_cache_dtype=kv_quant[0], k_scale=kv_quant[1], v_scale=kv_quant[1],
                window_size=window,
            )

        return attn_fn

    hidden, (k_caches, v_caches) = _gemma_layers(
        config, params, hidden, positions, slot_mapping, make_attn(0), k_caches, v_caches, tp_axis,
        kv_quant=kv_quant,
        attn_fn_local=make_attn(config.sliding_window) if config.gemma2 else None,
    )
    logits = _final_logits(params, config, hidden)
    return logits, k_caches, v_caches


def gemma_decode_step(
    params, config: GemmaConfig, token_ids, positions, seq_lens, block_tables,
    slot_mapping, k_caches, v_caches, tp_axis=None,
):
    """One decode step; returns (logits, k_caches, v_caches)."""
    hidden = jnp.take(params["embedding"], token_ids, axis=0)
    hidden = hidden * jnp.asarray(config.hidden_size**0.5, hidden.dtype)

    kv_quant = _kv_cache_quant(config, k_caches.dtype)

    def make_attn(window):
        def attn_fn(q, kc, vc):
            return paged_attention(
                q, kc, vc, block_tables, seq_lens, scale=_attn_scale(config),
                softcap=config.attn_logit_softcap,
                kv_cache_dtype=kv_quant[0], k_scale=kv_quant[1], v_scale=kv_quant[1],
                window_size=window,
            )

        return attn_fn

    hidden, (k_caches, v_caches) = _gemma_layers(
        config, params, hidden, positions, slot_mapping, make_attn(0), k_caches, v_caches, tp_axis,
        kv_quant=kv_quant,
        attn_fn_local=make_attn(config.sliding_window) if config.gemma2 else None,
    )
    logits = _final_logits(params, config, hidden)
    return logits, k_caches, v_caches
