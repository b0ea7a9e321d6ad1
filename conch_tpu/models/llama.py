# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Llama-family transformer built on the conch_tpu op library.

The flagship end-to-end model for the serving path (north star in
BASELINE.json): decoder-only transformer with RMS norm, NeoX RoPE, GQA
attention over a *paged* KV cache, and SwiGLU MLP — every hot op is a
conch_tpu kernel:

- norms:      ``ops.normalization`` (Pallas)
- rope:       ``ops.embedding.rotary_embedding`` (Pallas)
- attention:  ``ops.attention.{varlen,paged}_attention`` (Pallas, paged KV)
- cache:      ``ops.cache.reshape_and_cache`` (donated scatter)
- mlp gate:   ``ops.activation.silu_and_mul`` (Pallas)
- matmuls:    ``models.linear.QuantizedLinear`` (dense MXU or
              mixed-precision dequant-GEMM for int4/int8/nf4 weights)

Layers are *stacked and scanned* (``jax.lax.scan``) so compile time is
O(1) in depth; the KV caches ride the scan as stacked (L, ...) arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.models.linear import QuantizedLinear, quantize_linear
from conch_tpu.ops.activation import silu_and_mul, silu_and_mul_parts
from conch_tpu.ops.attention import paged_attention, varlen_attention
from conch_tpu.ops.cache import reshape_and_cache, reshape_and_cache_stacked
from conch_tpu.ops.embedding import rotary_embedding
from conch_tpu.ops.normalization import rms_norm
from conch_tpu.reference.embedding.rotary_embedding import compute_cos_sin_cache


@dataclass(frozen=True)
class LlamaConfig:
    """Model hyperparameters (defaults: a tiny debug model)."""

    vocab_size: int = 256
    hidden_size: int = 256
    intermediate_size: int = 512
    num_layers: int = 2
    num_heads: int = 4
    num_kv_heads: int = 2
    head_dim: int = 64
    rope_theta: float = 500000.0
    rms_norm_eps: float = 1e-5
    max_position: int = 8192
    dtype: Any = jnp.bfloat16
    # Static per-tensor scale for quantized (int8/fp8) KV caches: K/V are
    # stored as round(x/scale) and dequantized by folding the scale into
    # the attention scalars. Used only when the cache buffers are int8 or
    # float8 (see _kv_cache_quant).
    kv_cache_scale: float = 1.0 / 16
    # Qwen2-style additive q/k/v projection biases ("bq"/"bk"/"bv" layer
    # params; TP: sharded with the column-parallel outputs).
    attention_bias: bool = False
    # Mistral-style sliding-window attention: each token attends only the
    # last `sliding_window` positions (0 disables). Applied uniformly to
    # every layer (the Mistral/Mixtral convention).
    sliding_window: int = 0
    # Rolling KV buffer for sliding-window models: each sequence's block
    # table is a ring of this many pages holding position p at slot
    # p % (kv_ring_pages*page_size), capping KV memory at the window
    # regardless of sequence length. Set by the serving engine
    # (rolling_kv=True); requires sliding_window > 0. 0 disables.
    kv_ring_pages: int = 0
    # HF-style rope scaling dict; only the "llama3" scheme is supported
    # (Llama-3.1+ checkpoints). None disables. Stored as a tuple of items
    # so the frozen config stays hashable.
    rope_scaling: tuple | None = None

    def rope_scaling_dict(self) -> dict | None:
        return dict(self.rope_scaling) if self.rope_scaling else None

    @staticmethod
    def qwen2_7b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=152064,
            hidden_size=3584,
            intermediate_size=18944,
            num_layers=28,
            num_heads=28,
            num_kv_heads=4,
            head_dim=128,
            rope_theta=1e6,
            rms_norm_eps=1e-6,
            max_position=32768,
            attention_bias=True,
        )

    @staticmethod
    def llama3_8b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=128256,
            hidden_size=4096,
            intermediate_size=14336,
            num_layers=32,
            num_heads=32,
            num_kv_heads=8,
            head_dim=128,
            rope_theta=500000.0,
            rms_norm_eps=1e-5,
            max_position=8192,
        )

    @staticmethod
    def llama31_8b() -> "LlamaConfig":
        import dataclasses

        return dataclasses.replace(
            LlamaConfig.llama3_8b(),
            max_position=131072,
            rope_scaling=(
                ("rope_type", "llama3"), ("factor", 8.0), ("low_freq_factor", 1.0),
                ("high_freq_factor", 4.0), ("original_max_position_embeddings", 8192),
            ),
        )

    @staticmethod
    def llama3_70b() -> "LlamaConfig":
        return LlamaConfig(
            vocab_size=128256,
            hidden_size=8192,
            intermediate_size=28672,
            num_layers=80,
            num_heads=64,
            num_kv_heads=8,
            head_dim=128,
            rope_theta=500000.0,
            rms_norm_eps=1e-5,
            max_position=8192,
        )

    @staticmethod
    def tiny(**overrides) -> "LlamaConfig":
        return LlamaConfig(**overrides)


def init_llama_params(
    seed: int, config: LlamaConfig, quant_mode: str = "bf16", group_size: int = 128,
    blocksize: int = 64,
) -> dict:
    """Random-initialize Llama params; projections stored per ``quant_mode``.

    Layer weights are stacked along a leading layer axis for ``lax.scan``.
    Quantized projections are stacked per-array (packed/scales).
    """
    rng = np.random.default_rng(seed)
    h, inter = config.hidden_size, config.intermediate_size
    q_dim = config.num_heads * config.head_dim
    kv_dim = config.num_kv_heads * config.head_dim
    std = 0.02

    def make_proj(k_dim: int, n_dim: int) -> QuantizedLinear:
        w = rng.standard_normal((k_dim, n_dim), dtype=np.float32) * std
        kwargs = {"group_size": group_size} if quant_mode in ("int4", "int8") else {}
        if quant_mode == "nf4":
            kwargs = {"blocksize": blocksize}
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
            "input_norm": jnp.ones((h,), dtype=config.dtype),
            "post_attn_norm": jnp.ones((h,), dtype=config.dtype),
        }
        if config.attention_bias:
            layer["bq"] = jnp.asarray(rng.normal(size=q_dim) * std, config.dtype)
            layer["bk"] = jnp.asarray(rng.normal(size=kv_dim) * std, config.dtype)
            layer["bv"] = jnp.asarray(rng.normal(size=kv_dim) * std, config.dtype)
        return layer

    layer_params = stack_layers(make_layer)

    return {
        "embedding": jnp.asarray(rng.standard_normal((config.vocab_size, h), dtype=np.float32) * std, dtype=config.dtype),
        "layers": layer_params,
        "final_norm": jnp.ones((h,), dtype=config.dtype),
        "lm_head": quantize_linear(
            rng.standard_normal((h, config.vocab_size), dtype=np.float32) * std,
            quant_mode if quant_mode != "int4" else "bf16",
            **({"group_size": group_size} if quant_mode == "int8" else {}),
        ),
        "cos_sin_cache": compute_cos_sin_cache(
            config.rope_theta, config.head_dim, config.max_position,
            rope_scaling=config.rope_scaling_dict(),
        ),
    }


def requantize_llama_params(
    params: dict, config: LlamaConfig, quant_mode: str, group_size: int = 128
) -> dict:
    """Convert a dense (bf16) param tree into a quantized serving tree.

    The post-training-quantization step: take params produced by
    ``init_llama_params(..., "bf16")`` (possibly trained since) and rebuild
    every projection in ``quant_mode`` ("int4" | "int8" | "nf4" | "bf16"),
    matching the layout ``init_llama_params`` would produce natively
    (stacked per-array layer weights, lm_head kept bf16 for int4 parity).
    """
    kwargs = {"group_size": group_size} if quant_mode in ("int4", "int8") else {}

    def requant_stacked(ql: QuantizedLinear) -> QuantizedLinear:
        assert ql.kind == "dense", f"requantize needs dense params, got {ql.kind}"
        w = np.asarray(ql.arrays["w"], dtype=np.float32)  # (L, K, N)
        per_layer = [quantize_linear(w[i], quant_mode, **kwargs) for i in range(w.shape[0])]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

    layers = dict(params["layers"])
    for name in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        layers[name] = requant_stacked(params["layers"][name])

    head = params["lm_head"]
    assert head.kind == "dense"
    head_mode = quant_mode if quant_mode != "int4" else "bf16"
    head_kwargs = kwargs if head_mode in ("int4", "int8") else {}
    out = dict(params)
    out["layers"] = layers
    out["lm_head"] = quantize_linear(
        np.asarray(head.arrays["w"], dtype=np.float32), head_mode, **head_kwargs
    )
    return out


def init_kv_caches(config: LlamaConfig, num_pages: int, page_size: int, cache_dtype=None) -> tuple[jax.Array, jax.Array]:
    """Allocate stacked (L, P, KH, ps, D) key/value caches."""
    cache_dtype = cache_dtype or config.dtype
    shape = (config.num_layers, num_pages, config.num_kv_heads, page_size, config.head_dim)
    return jnp.zeros(shape, dtype=cache_dtype), jnp.zeros(shape, dtype=cache_dtype)


def _kv_cache_quant(config: LlamaConfig, cache_dtype) -> tuple[str, jax.Array | None]:
    """Map a KV-cache buffer dtype to (kv_cache_dtype string, scale array)
    for reshape_and_cache / attention (quantize-on-store + folded dequant)."""
    if cache_dtype == jnp.int8:
        return "int8", jnp.asarray([config.kv_cache_scale], jnp.float32)
    if cache_dtype == jnp.float8_e4m3fn:
        return "fp8_e4m3", jnp.asarray([config.kv_cache_scale], jnp.float32)
    return "auto", None


def _layer_step_factory(config: LlamaConfig, attn_fn, cos_sin_cache, positions, slot_mapping, tp_axis: str | None = None, num_heads: int | None = None, num_kv_heads: int | None = None, kv_quant: tuple[str, jax.Array | None] = ("auto", None), mlp_fn=None, lora_sel: jax.Array | None = None, cache_mode: str = "rmw", heavy: dict | None = None):
    """Build the scanned per-layer function shared by prefill and decode.

    With ``tp_axis`` set (inside a shard_map), the per-chip head counts are
    the *local* counts and the row-parallel projections (wo, w_down) psum
    their partial outputs over the tensor-parallel axis.

    ``mlp_fn(layer, mlp_in) -> delta`` overrides the dense SwiGLU MLP
    (e.g. the MoE feed-forward in ``models/moe.py``); an override owns its
    own cross-device reduction.

    ``lora_sel`` (tokens, adapters) is the scaled one-hot multi-LoRA
    selector (``models/lora.py``); the per-layer adapter stacks ride the
    scanned layer dict under the reserved key ``"__lora__"``. Low-rank
    deltas are added *before* the row-parallel psum, so under TP the
    K-sharded ``A`` factors of wo/w_down reduce through the same
    collective as the base matmul.

    ``heavy`` carries the big projection weights OUT of the scan: the
    stacked (L, ...) QuantizedLinear pytrees stay scan-invariant and each
    GEMM selects its layer via the kernel's scalar-prefetch index
    (:meth:`QuantizedLinear.apply_stacked`). Scanning them as xs slices
    makes XLA materialize a copy of every weight per layer per step —
    measured 2-7x GEMM bandwidth loss on v5e (exp_lmhead_r4b.log).
    """
    eps = config.rms_norm_eps
    num_heads = num_heads or config.num_heads
    num_kv_heads = num_kv_heads or config.num_kv_heads
    n_tokens_heads = (num_heads, config.head_dim)
    kv_heads = (num_kv_heads, config.head_dim)

    def reduce_tp(x):
        return jax.lax.psum(x, tp_axis) if tp_axis else x

    def layer_step(carry, xs):
        # Caches ride the CARRY, not xs/ys: threading them as scan slices
        # re-stacks the whole pool into fresh ys every step (~1 GB and
        # 3.4 ms per decode step at Llama-8B b8 ctx1024 — measured in
        # tools/drive/exp_cache_scan.py). The stacked cache write is an
        # aliased in-place pallas scatter; attention reads index the
        # stacked pool with the layer scalar inside the kernel.
        hidden, k_caches, v_caches = carry
        layer, l_idx = xs
        t = hidden.shape[0]
        lora_layer = layer.get("__lora__")

        def lora_add(name, x, y):
            if lora_layer is not None and name in lora_layer:
                from conch_tpu.models.lora import lora_delta

                ab = lora_layer[name]
                y = (y.astype(jnp.float32) + lora_delta(x, ab["a"], ab["b"], lora_sel)).astype(y.dtype)
            return y

        def proj(name, x):
            if heavy is not None and name in heavy:
                y = heavy[name].apply_stacked(x, l_idx)
            else:
                y = layer[name].apply(x)
            return lora_add(name, x, y)

        def has(name):
            return (heavy is not None and name in heavy) or name in layer

        attn_in = rms_norm(hidden, layer["input_norm"], eps)
        if has("wqkv"):
            # Fused [q|k|v] wide-N GEMM (fuse_llama_params); slice the
            # output. Per-name LoRA deltas attach to the slices so adapter
            # checkpoints stay per-projection.
            q_dim = num_heads * config.head_dim
            kv_dim = num_kv_heads * config.head_dim
            qkv = proj("wqkv", attn_in)
            q = lora_add("wq", attn_in, qkv[:, :q_dim])
            k = lora_add("wk", attn_in, qkv[:, q_dim : q_dim + kv_dim])
            v = lora_add("wv", attn_in, qkv[:, q_dim + kv_dim :])
        else:
            q = proj("wq", attn_in)
            k = proj("wk", attn_in)
            v = proj("wv", attn_in)
        if "bq" in layer:  # Qwen2-style attention bias
            q = q + layer["bq"].astype(q.dtype)
            k = k + layer["bk"].astype(k.dtype)
            v = v + layer["bv"].astype(v.dtype)
        q, k = rotary_embedding(positions, q, k, config.head_dim, cos_sin_cache)

        k = k.reshape(t, *kv_heads)
        v = v.reshape(t, *kv_heads)
        kv_dtype, kv_scale = kv_quant
        if cache_mode == "rmw":
            # Decode: one token per sequence, exclusive write pages -> the
            # aliased read-modify-write kernel updates in place (~32 KB).
            k_caches, v_caches = reshape_and_cache_stacked(
                k, v, k_caches, v_caches, slot_mapping, l_idx,
                kv_cache_dtype=kv_dtype, k_scale=kv_scale, v_scale=kv_scale,
            )
        else:
            # Prefill/verify: many tokens per page window (the RMW hazard
            # contract does not hold) -> per-layer scatter on a dynamic
            # slice of the carry; the layer-slice roundtrip amortizes over
            # the whole token chunk.
            kl = jax.lax.dynamic_index_in_dim(k_caches, l_idx, 0, keepdims=False)
            vl = jax.lax.dynamic_index_in_dim(v_caches, l_idx, 0, keepdims=False)
            kl, vl = reshape_and_cache(
                k, v, kl, vl, slot_mapping,
                kv_cache_dtype=kv_dtype, k_scale=kv_scale, v_scale=kv_scale,
            )
            k_caches = jax.lax.dynamic_update_index_in_dim(k_caches, kl, l_idx, 0)
            v_caches = jax.lax.dynamic_update_index_in_dim(v_caches, vl, l_idx, 0)

        attn_out = attn_fn(q.reshape(t, *n_tokens_heads), k_caches, v_caches, l_idx)
        hidden = hidden + reduce_tp(proj("wo", attn_out.reshape(t, -1)))

        mlp_in = rms_norm(hidden, layer["post_attn_norm"], eps)
        if mlp_fn is not None:
            hidden = hidden + mlp_fn(layer, mlp_in)
        elif has("w_gateup"):
            gu = proj("w_gateup", mlp_in)
            if lora_layer is not None and ("w_gate" in lora_layer or "w_up" in lora_layer):
                inter = gu.shape[-1] // 2
                gate = lora_add("w_gate", mlp_in, gu[:, :inter])
                up = lora_add("w_up", mlp_in, gu[:, inter:])
                act = silu_and_mul_parts(gate, up)
            else:
                act = silu_and_mul(gu)
            hidden = hidden + reduce_tp(proj("w_down", act))
        else:
            gate = proj("w_gate", mlp_in)
            up = proj("w_up", mlp_in)
            hidden = hidden + reduce_tp(proj("w_down", silu_and_mul_parts(gate, up)))

        return (hidden, k_caches, v_caches), ()

    return layer_step


def _splice_lora(layers: dict, lora: dict | None, lora_ids: jax.Array | None):
    """Attach the stacked adapter arrays to the scanned layer dict and
    build the per-token selector. No-LoRA calls pass through unchanged."""
    if lora is None:
        return layers, None
    if lora_ids is None:
        msg = "lora adapters were given but lora_ids is None"
        raise ValueError(msg)
    from conch_tpu.models.lora import lora_selector

    spliced = dict(layers)
    spliced["__lora__"] = lora["layers"]
    return spliced, lora_selector(lora_ids, lora["scales"])


_HEAVY_PROJ_NAMES = (
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "wqkv", "w_gateup"
)

_FUSION_GROUPS = (("wqkv", ("wq", "wk", "wv")), ("w_gateup", ("w_gate", "w_up")))


def fuse_llama_params(params: dict) -> dict:
    """Fuse QKV and gate|up into single wide-N projections (eager, one-time).

    Returns a new params dict whose layer stack stores ``wqkv`` =
    [wq|wk|wv] and ``w_gateup`` = [w_gate|w_up] (column concatenation via
    :meth:`QuantizedLinear.concat_n`); the scanned layer step slices the
    GEMM *output* instead. Rationale: at decode the small-N projections
    (wk/wv at N=1024) measure 128-198 GB/s on v5e while the same kernel
    reaches 750+ GB/s on wide-N tiles — one (N=6144) QKV GEMM and one
    (N=28672) gate|up GEMM put every per-layer GEMM in the amortized
    regime and halve kernel launches (round-4 profile,
    exp_decode_profile_r4b.log). Must run OUTSIDE jit (e.g. at engine
    init): inside a traced step the concat would re-run every call.

    Pieces that cannot fuse (mixed kinds, padded N, non-QuantizedLinear
    MoE expert stacks) are left unfused — the layer step handles either
    schema. Per-name attention biases and LoRA adapters stay separate and
    are applied to the sliced outputs.
    """
    from conch_tpu.models.linear import QuantizedLinear

    layers = dict(params["layers"])
    for fused_name, parts in _FUSION_GROUPS:
        if not all(isinstance(layers.get(p), QuantizedLinear) for p in parts):
            continue
        try:
            fused = QuantizedLinear.concat_n([layers[p] for p in parts])
        except ValueError:
            continue
        layers[fused_name] = fused
        for p in parts:
            del layers[p]
    out = dict(params)
    out["layers"] = layers
    return out


def fuse_llama_params_sharded(params: dict, mesh) -> dict:
    """Tensor-parallel variant of :func:`fuse_llama_params`.

    Takes params ALREADY sharded by ``parallel.sharding.shard_llama_params``
    (column-parallel wq/wk/wv/w_gate/w_up) and concatenates each chip's
    LOCAL shards inside a ``shard_map`` — no cross-chip data movement.
    The resulting global weight's column order is chip-blocked
    ([q0|k0|v0 | q1|k1|v1 | ...]) rather than [q|k|v]: that is exactly
    right, because under shard_map the layer step slices the fused GEMM
    output by the per-chip LOCAL head counts. Naively sharding a fused
    [q|k|v] weight instead would give chip 0 only q columns (guarded in
    ``shard_llama_params``).
    """
    from jax.sharding import NamedSharding
    from jax.experimental.shard_map import shard_map

    from conch_tpu.models.linear import QuantizedLinear

    layers = dict(params["layers"])
    for fused_name, parts in _FUSION_GROUPS:
        if not all(isinstance(layers.get(p), QuantizedLinear) for p in parts):
            continue
        pieces = [layers[p] for p in parts]
        specs = []
        ok = True
        for piece in pieces:
            leaves = jax.tree.leaves(piece)
            if not all(isinstance(a.sharding, NamedSharding) for a in leaves):
                ok = False
                break
            specs.append(jax.tree.map(lambda a: a.sharding.spec, piece))
        if not ok:
            continue
        try:
            fused = shard_map(
                lambda *ps: QuantizedLinear.concat_n(list(ps)),
                mesh=mesh,
                in_specs=tuple(specs),
                out_specs=specs[0],
                check_rep=False,
            )(*pieces)
        except ValueError:  # not fusable (mixed meta / padded N)
            continue
        layers[fused_name] = fused
        for p in parts:
            del layers[p]
    out = dict(params)
    out["layers"] = layers
    return out


def _split_heavy(layers: dict) -> tuple[dict | None, dict]:
    """Split the stacked layer dict into (heavy projections, the rest).

    Heavy QuantizedLinear stacks are closed over as scan invariants and
    indexed inside the GEMM kernels (scalar prefetch); everything else
    (norm vectors, biases, LoRA stacks, MoE experts) keeps riding the scan
    xs — their slices are small or owned by ``mlp_fn``.
    """
    from conch_tpu.models.linear import QuantizedLinear

    heavy = {
        k: v
        for k, v in layers.items()
        if k in _HEAVY_PROJ_NAMES and isinstance(v, QuantizedLinear)
    }
    light = {k: v for k, v in layers.items() if k not in heavy}
    return (heavy or None), light


def llama_prefill(
    params: dict,
    config: LlamaConfig,
    token_ids: jax.Array,  # (total_tokens,)
    positions: jax.Array,  # (total_tokens,)
    cu_seqlens_q: jax.Array,  # (batch+1,)
    max_seqlen_q: int,
    seq_lens: jax.Array,  # (batch,)
    block_tables: jax.Array,  # (batch, max_pages)
    slot_mapping: jax.Array,  # (total_tokens,)
    k_caches: jax.Array,  # (L, P, KH, ps, D)
    v_caches: jax.Array,
    tp_axis: str | None = None,
    lora: dict | None = None,
    lora_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Prefill (or chunked-prefill) forward pass.

    Returns (last-token logits per sequence (batch, vocab), k_caches, v_caches).
    Inside a shard_map, ``tp_axis`` names the tensor-parallel mesh axis and
    all shapes are per-chip shards. ``lora``/``lora_ids`` enable per-token
    multi-LoRA dispatch (``models/lora.py``).
    """
    hidden = jnp.take(params["embedding"], token_ids, axis=0)
    num_kv_heads = k_caches.shape[2]
    group = config.num_heads // config.num_kv_heads

    kv_quant = _kv_cache_quant(config, k_caches.dtype)
    layers, lora_sel = _splice_lora(params["layers"], lora, lora_ids)

    def attn_fn(q, k_caches, v_caches, l_idx):
        return varlen_attention(
            q, k_caches, v_caches, cu_seqlens_q, max_seqlen_q, seq_lens,
            max_seqlen_q, block_tables, causal=True,
            kv_cache_dtype=kv_quant[0], k_scale=kv_quant[1], v_scale=kv_quant[1],
            window_size=config.sliding_window,
            ring_pages=config.kv_ring_pages,
            layer_idx=l_idx,
        )

    heavy, light = _split_heavy(layers)
    layer_step = _layer_step_factory(
        config, attn_fn, params["cos_sin_cache"], positions, slot_mapping,
        tp_axis=tp_axis, num_heads=num_kv_heads * group, num_kv_heads=num_kv_heads,
        kv_quant=kv_quant, lora_sel=lora_sel, cache_mode="scatter", heavy=heavy,
    )
    layer_ids = jnp.arange(k_caches.shape[0], dtype=jnp.int32)
    (hidden, k_caches, v_caches), _ = jax.lax.scan(
        layer_step, (hidden, k_caches, v_caches), (light, layer_ids)
    )

    # Only the last token of each sequence produces next-token logits.
    last_rows = cu_seqlens_q[1:] - 1
    hidden_last = jnp.take(hidden, last_rows, axis=0)
    hidden_last = rms_norm(hidden_last, params["final_norm"], config.rms_norm_eps)
    logits = params["lm_head"].apply(hidden_last)
    return logits.astype(jnp.float32), k_caches, v_caches


def llama_verify_forward(
    params: dict,
    config: LlamaConfig,
    token_ids: jax.Array,  # (total_tokens,)
    positions: jax.Array,  # (total_tokens,)
    cu_seqlens_q: jax.Array,  # (batch+1,)
    max_seqlen_q: int,
    seq_lens: jax.Array,  # (batch,)
    block_tables: jax.Array,
    slot_mapping: jax.Array,
    k_caches: jax.Array,
    v_caches: jax.Array,
    tp_axis: str | None = None,
    lora: dict | None = None,
    lora_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Speculative-decoding verification forward: identical to
    ``llama_prefill`` but returns logits for EVERY query token, so the
    engine can check each drafted token's prediction in one pass. KV for
    rejected positions needs no rollback — paged attention masks entries
    past ``seq_len`` and later steps overwrite their slots.
    """
    hidden = jnp.take(params["embedding"], token_ids, axis=0)
    num_kv_heads = k_caches.shape[2]
    group = config.num_heads // config.num_kv_heads
    kv_quant = _kv_cache_quant(config, k_caches.dtype)
    layers, lora_sel = _splice_lora(params["layers"], lora, lora_ids)

    def attn_fn(q, k_caches, v_caches, l_idx):
        return varlen_attention(
            q, k_caches, v_caches, cu_seqlens_q, max_seqlen_q, seq_lens,
            max_seqlen_q, block_tables, causal=True,
            kv_cache_dtype=kv_quant[0], k_scale=kv_quant[1], v_scale=kv_quant[1],
            window_size=config.sliding_window,
            ring_pages=config.kv_ring_pages,
            layer_idx=l_idx,
        )

    heavy, light = _split_heavy(layers)
    layer_step = _layer_step_factory(
        config, attn_fn, params["cos_sin_cache"], positions, slot_mapping,
        tp_axis=tp_axis, num_heads=num_kv_heads * group, num_kv_heads=num_kv_heads,
        kv_quant=kv_quant, lora_sel=lora_sel, cache_mode="scatter", heavy=heavy,
    )
    layer_ids = jnp.arange(k_caches.shape[0], dtype=jnp.int32)
    (hidden, k_caches, v_caches), _ = jax.lax.scan(
        layer_step, (hidden, k_caches, v_caches), (light, layer_ids)
    )

    hidden = rms_norm(hidden, params["final_norm"], config.rms_norm_eps)
    logits = params["lm_head"].apply(hidden)
    return logits.astype(jnp.float32), k_caches, v_caches


def llama_decode_step(
    params: dict,
    config: LlamaConfig,
    token_ids: jax.Array,  # (batch,)
    positions: jax.Array,  # (batch,)
    seq_lens: jax.Array,  # (batch,) lengths INCLUDING the new token
    block_tables: jax.Array,  # (batch, max_pages)
    slot_mapping: jax.Array,  # (batch,)
    k_caches: jax.Array,
    v_caches: jax.Array,
    tp_axis: str | None = None,
    lora: dict | None = None,
    lora_ids: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One decode step for a batch of sequences.

    Returns (logits (batch, vocab), k_caches, v_caches). Inside a
    shard_map, ``tp_axis`` names the tensor-parallel mesh axis and all
    head-bearing shapes are per-chip shards.
    """
    hidden = jnp.take(params["embedding"], token_ids, axis=0)
    num_kv_heads = k_caches.shape[2]
    group = config.num_heads // config.num_kv_heads

    kv_quant = _kv_cache_quant(config, k_caches.dtype)
    layers, lora_sel = _splice_lora(params["layers"], lora, lora_ids)

    def attn_fn(q, k_caches, v_caches, l_idx):
        return paged_attention(
            q, k_caches, v_caches, block_tables, seq_lens,
            kv_cache_dtype=kv_quant[0], k_scale=kv_quant[1], v_scale=kv_quant[1],
            window_size=config.sliding_window,
            ring_pages=config.kv_ring_pages,
            layer_idx=l_idx,
        )

    heavy, light = _split_heavy(layers)
    layer_step = _layer_step_factory(
        config, attn_fn, params["cos_sin_cache"], positions, slot_mapping,
        tp_axis=tp_axis, num_heads=num_kv_heads * group, num_kv_heads=num_kv_heads,
        kv_quant=kv_quant, lora_sel=lora_sel, heavy=heavy,
    )
    layer_ids = jnp.arange(k_caches.shape[0], dtype=jnp.int32)
    (hidden, k_caches, v_caches), _ = jax.lax.scan(
        layer_step, (hidden, k_caches, v_caches), (light, layer_ids)
    )

    hidden = rms_norm(hidden, params["final_norm"], config.rms_norm_eps)
    logits = params["lm_head"].apply(hidden)
    return logits.astype(jnp.float32), k_caches, v_caches
