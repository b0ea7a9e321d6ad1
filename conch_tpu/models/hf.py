# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""HuggingFace checkpoint import: HF state dicts -> conch_tpu param trees.

A user of the reference serves HF-format weights; this module is the
bridge for the Llama/Mixtral/Gemma families. The converter is pure
numpy -> pytree (no torch dependency at import time); safetensors
loading is an optional helper. Weights can be quantized on the way in
(``quant_mode``: bf16/int4/int8/nf4/w8a8 — the same modes as
``models.linear.quantize_linear``).

Layout notes (validated by the transformers-oracle test
``tests/hf_convert_test.py``):
- HF ``nn.Linear`` stores (out_features, in_features); conch projections
  are (K, N) = (in, out), so every weight transposes.
- HF Llama RoPE is NeoX-style rotate-half — identical to
  ``ops.embedding.rotary_embedding``; head ordering is head-major in
  both, so q/k/v need no permutation.
- Tied embeddings (no ``lm_head.weight``) reuse ``embed_tokens``.
"""

from __future__ import annotations

import pathlib
import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.models.linear import quantize_linear
from conch_tpu.reference.embedding.rotary_embedding import compute_cos_sin_cache


def load_safetensors_dir(path: str | pathlib.Path) -> dict[str, np.ndarray]:
    """Load every ``*.safetensors`` shard under ``path`` into one dict."""
    from safetensors.numpy import load_file

    path = pathlib.Path(path)
    shards = sorted(path.glob("*.safetensors"))
    if not shards:
        msg = f"no .safetensors files under {path}"
        raise FileNotFoundError(msg)
    state: dict[str, np.ndarray] = {}
    for shard in shards:
        state.update(load_file(str(shard)))
    return state


def _np(x: Any) -> np.ndarray:
    """Accept numpy arrays or torch tensors."""
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().to("cpu").float().numpy()
    return np.asarray(x)


def _num_layers(state: Mapping[str, Any]) -> int:
    pat = re.compile(r"model\.layers\.(\d+)\.")
    idx = {int(m.group(1)) for k in state if (m := pat.match(k))}
    if not idx:
        msg = "no 'model.layers.N.' keys found — not an HF decoder state dict?"
        raise ValueError(msg)
    return max(idx) + 1


def _stack(trees: list[Any]) -> Any:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def llama_params_from_hf(
    state: Mapping[str, Any],
    config,
    quant_mode: str = "bf16",
    group_size: int = 128,
) -> dict:
    """Convert an HF ``LlamaForCausalLM`` state dict to conch_tpu params.

    ``config`` is a ``models.llama.LlamaConfig`` matching the checkpoint.
    """

    def proj(name: str, mode: str = quant_mode):
        w = _np(state[name]).T.astype(np.float32)  # (out,in) -> (K,N)
        kwargs = {"group_size": group_size} if mode in ("int4", "int8") else {}
        return quantize_linear(w, mode, **kwargs)

    layers = []
    for i in range(config.num_layers):
        p = f"model.layers.{i}."
        layer = {
            "wq": proj(p + "self_attn.q_proj.weight"),
            "wk": proj(p + "self_attn.k_proj.weight"),
            "wv": proj(p + "self_attn.v_proj.weight"),
            "wo": proj(p + "self_attn.o_proj.weight"),
            "w_gate": proj(p + "mlp.gate_proj.weight"),
            "w_up": proj(p + "mlp.up_proj.weight"),
            "w_down": proj(p + "mlp.down_proj.weight"),
            "input_norm": jnp.asarray(_np(state[p + "input_layernorm.weight"]), config.dtype),
            "post_attn_norm": jnp.asarray(
                _np(state[p + "post_attention_layernorm.weight"]), config.dtype
            ),
        }
        if p + "self_attn.q_proj.bias" in state:  # Qwen2-family
            if not config.attention_bias:
                msg = "checkpoint has q/k/v biases: set LlamaConfig.attention_bias=True"
                raise ValueError(msg)
            layer["bq"] = jnp.asarray(_np(state[p + "self_attn.q_proj.bias"]), config.dtype)
            layer["bk"] = jnp.asarray(_np(state[p + "self_attn.k_proj.bias"]), config.dtype)
            layer["bv"] = jnp.asarray(_np(state[p + "self_attn.v_proj.bias"]), config.dtype)
        layers.append(layer)

    head_key = "lm_head.weight" if "lm_head.weight" in state else "model.embed_tokens.weight"
    head_mode = quant_mode if quant_mode != "int4" else "bf16"  # match init_llama_params
    return {
        "embedding": jnp.asarray(_np(state["model.embed_tokens.weight"]), config.dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_np(state["model.norm.weight"]), config.dtype),
        "lm_head": quantize_linear(
            _np(state[head_key]).T.astype(np.float32),
            head_mode,
            **({"group_size": group_size} if head_mode == "int8" else {}),
        ),
        "cos_sin_cache": compute_cos_sin_cache(
            config.rope_theta, config.head_dim, config.max_position,
            rope_scaling=config.rope_scaling_dict(),
        ),
    }


def mixtral_params_from_hf(
    state: Mapping[str, Any],
    config,
    quant_mode: str = "bf16",
    group_size: int = 128,
) -> dict:
    """Convert an HF ``MixtralForCausalLM`` state dict.

    ``config`` is a ``models.moe.MoEConfig``. Expert weights
    ``block_sparse_moe.experts.{e}.w{1,2,3}`` stack to the (L, E, ...)
    einsum layout ``init_moe_params`` uses (w1=gate, w3=up, w2=down);
    the router is ``block_sparse_moe.gate``.
    """
    c = config.llama

    def proj(name: str):
        w = _np(state[name]).T.astype(np.float32)
        kwargs = {"group_size": group_size} if quant_mode in ("int4", "int8") else {}
        return quantize_linear(w, quant_mode, **kwargs)

    layers = []
    for i in range(c.num_layers):
        p = f"model.layers.{i}."
        gate = jnp.stack(
            [jnp.asarray(_np(state[f"{p}block_sparse_moe.experts.{e}.w1.weight"]).T, c.dtype)
             for e in range(config.num_experts)]
        )
        up = jnp.stack(
            [jnp.asarray(_np(state[f"{p}block_sparse_moe.experts.{e}.w3.weight"]).T, c.dtype)
             for e in range(config.num_experts)]
        )
        down = jnp.stack(
            [jnp.asarray(_np(state[f"{p}block_sparse_moe.experts.{e}.w2.weight"]).T, c.dtype)
             for e in range(config.num_experts)]
        )
        layers.append(
            {
                "wq": proj(p + "self_attn.q_proj.weight"),
                "wk": proj(p + "self_attn.k_proj.weight"),
                "wv": proj(p + "self_attn.v_proj.weight"),
                "wo": proj(p + "self_attn.o_proj.weight"),
                "router": jnp.asarray(_np(state[p + "block_sparse_moe.gate.weight"]).T, jnp.float32),
                "w_gate": gate,
                "w_up": up,
                "w_down": down,
                "input_norm": jnp.asarray(_np(state[p + "input_layernorm.weight"]), c.dtype),
                "post_attn_norm": jnp.asarray(
                    _np(state[p + "post_attention_layernorm.weight"]), c.dtype
                ),
            }
        )

    head_key = "lm_head.weight" if "lm_head.weight" in state else "model.embed_tokens.weight"
    return {
        "embedding": jnp.asarray(_np(state["model.embed_tokens.weight"]), c.dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_np(state["model.norm.weight"]), c.dtype),
        "lm_head": quantize_linear(_np(state[head_key]).T.astype(np.float32), "bf16"),
        "cos_sin_cache": compute_cos_sin_cache(
            c.rope_theta, c.head_dim, c.max_position, rope_scaling=c.rope_scaling_dict()
        ),
    }


def gemma_params_from_hf(state: Mapping[str, Any], config, quant_mode: str = "bf16", group_size: int = 128) -> dict:
    """Convert an HF ``GemmaForCausalLM`` state dict (tied embeddings;
    HF stores Gemma norm weights as the ``(1 + w)`` offset form conch
    uses natively, so norms copy through unchanged)."""

    def proj(name: str):
        w = _np(state[name]).T.astype(np.float32)
        kwargs = {"group_size": group_size} if quant_mode in ("int4", "int8") else {}
        return quantize_linear(w, quant_mode, **kwargs)

    layers = []
    for i in range(config.num_layers):
        p = f"model.layers.{i}."
        layer = {
            "wq": proj(p + "self_attn.q_proj.weight"),
            "wk": proj(p + "self_attn.k_proj.weight"),
            "wv": proj(p + "self_attn.v_proj.weight"),
            "wo": proj(p + "self_attn.o_proj.weight"),
            "w_gate": proj(p + "mlp.gate_proj.weight"),
            "w_up": proj(p + "mlp.up_proj.weight"),
            "w_down": proj(p + "mlp.down_proj.weight"),
            "input_norm": jnp.asarray(_np(state[p + "input_layernorm.weight"]), config.dtype),
            "post_attn_norm": jnp.asarray(
                _np(state[p + "post_attention_layernorm.weight"]), config.dtype
            ),
        }
        has_sandwich = p + "pre_feedforward_layernorm.weight" in state
        if getattr(config, "gemma2", False) and not has_sandwich:
            msg = "GemmaConfig.gemma2=True but the checkpoint has no sandwich norms (Gemma-1?)"
            raise ValueError(msg)
        if has_sandwich:  # Gemma-2 sandwich norms
            if not getattr(config, "gemma2", False):
                msg = "checkpoint has Gemma-2 sandwich norms: set GemmaConfig.gemma2=True"
                raise ValueError(msg)
            layer["pre_ff_norm"] = jnp.asarray(
                _np(state[p + "pre_feedforward_layernorm.weight"]), config.dtype
            )
            layer["post_ff_norm"] = jnp.asarray(
                _np(state[p + "post_feedforward_layernorm.weight"]), config.dtype
            )
        layers.append(layer)

    return {
        "embedding": jnp.asarray(_np(state["model.embed_tokens.weight"]), config.dtype),
        "layers": _stack(layers),
        "final_norm": jnp.asarray(_np(state["model.norm.weight"]), config.dtype),
        "cos_sin_cache": compute_cos_sin_cache(
            config.rope_theta, config.head_dim, config.max_position
        ),
    }


def phi3_params_from_hf(
    state: Mapping[str, Any],
    config,
    quant_mode: str = "bf16",
    group_size: int = 128,
) -> dict:
    """Convert an HF ``Phi3ForCausalLM`` state dict (Llama architecture
    with FUSED projections). The fused ``qkv_proj`` ([q|k|v] rows) and
    ``gate_up_proj`` ([gate|up] rows) are split into synthesized per-
    projection keys and the result delegates to
    :func:`llama_params_from_hf` — one conversion path, including
    rope_scaling and tied-head handling."""
    q_dim = config.num_heads * config.head_dim
    kv_dim = config.num_kv_heads * config.head_dim
    inter = config.intermediate_size

    split: dict[str, Any] = {}
    for key, value in state.items():
        if key.endswith("self_attn.qkv_proj.weight"):
            qkv = _np(value)
            base = key[: -len("qkv_proj.weight")]
            split[base + "q_proj.weight"] = qkv[:q_dim]
            split[base + "k_proj.weight"] = qkv[q_dim : q_dim + kv_dim]
            split[base + "v_proj.weight"] = qkv[q_dim + kv_dim :]
        elif key.endswith("mlp.gate_up_proj.weight"):
            gu = _np(value)
            base = key[: -len("gate_up_proj.weight")]
            split[base + "gate_proj.weight"] = gu[:inter]
            split[base + "up_proj.weight"] = gu[inter:]
        else:
            split[key] = value
    return llama_params_from_hf(split, config, quant_mode=quant_mode, group_size=group_size)


def deepseek_params_from_hf(state: Mapping[str, Any], config) -> dict:
    """Convert an HF ``DeepseekV2ForCausalLM`` state dict to conch_tpu
    params in the ABSORBED layout: ``kv_b_proj`` is split into per-head
    W_uk (folded into the query) and W_uv (folded into the output) so the
    runtime never materializes per-head K/V (models/deepseek.py).

    ``config`` is a ``models.deepseek.DeepseekV2Config``.
    """
    from conch_tpu.models.deepseek import deepseek_rope_cache

    nh, nope, v = config.num_heads, config.qk_nope_head_dim, config.v_head_dim
    lora = config.kv_lora_rank

    def proj(name: str):
        return quantize_linear(_np(state[name]).T.astype(np.float32), "bf16")

    def norm(name: str):
        return jnp.asarray(_np(state[name]), config.dtype)

    dense_layers, moe_layers = [], []
    n_dense = config.num_layers if config.n_routed_experts == 0 else min(
        config.first_k_dense_replace, config.num_layers
    )
    for i in range(config.num_layers):
        p = f"model.layers.{i}."
        kv_b = _np(state[p + "self_attn.kv_b_proj.weight"]).astype(np.float32)
        kv_b = kv_b.T.reshape(lora, nh, nope + v)  # (out,in) -> (lora, H, nope+v)
        layer = {
            "w_kv_a": proj(p + "self_attn.kv_a_proj_with_mqa.weight"),
            "kv_a_norm": norm(p + "self_attn.kv_a_layernorm.weight"),
            "w_uk": jnp.asarray(kv_b[:, :, :nope].transpose(1, 2, 0), config.dtype),
            "w_uv": jnp.asarray(kv_b[:, :, nope:].transpose(1, 0, 2), config.dtype),
            "wo": proj(p + "self_attn.o_proj.weight"),
            "input_norm": norm(p + "input_layernorm.weight"),
            "post_attn_norm": norm(p + "post_attention_layernorm.weight"),
        }
        if config.q_lora_rank:
            layer["wq_a"] = proj(p + "self_attn.q_a_proj.weight")
            layer["q_a_norm"] = norm(p + "self_attn.q_a_layernorm.weight")
            layer["wq_b"] = proj(p + "self_attn.q_b_proj.weight")
        else:
            layer["wq"] = proj(p + "self_attn.q_proj.weight")
        if i < n_dense:
            layer["w_gate"] = proj(p + "mlp.gate_proj.weight")
            layer["w_up"] = proj(p + "mlp.up_proj.weight")
            layer["w_down"] = proj(p + "mlp.down_proj.weight")
            dense_layers.append(layer)
        else:
            # HF gate weight is (E, hidden); router_w is (hidden, E).
            layer["router_w"] = jnp.asarray(
                _np(state[p + "mlp.gate.weight"]).T, config.dtype
            )
            if config.topk_method == "noaux_tc":  # V3 correction bias
                layer["router_bias"] = jnp.asarray(
                    _np(state[p + "mlp.gate.e_score_correction_bias"]), jnp.float32
                )
            for field, hf in (("e_gate", "gate_proj"), ("e_up", "up_proj"), ("e_down", "down_proj")):
                layer[field] = jnp.asarray(
                    np.stack(
                        [
                            _np(state[p + f"mlp.experts.{e}.{hf}.weight"]).T
                            for e in range(config.n_routed_experts)
                        ]
                    ),
                    config.dtype,
                )
            if config.n_shared_experts > 0:
                layer["shared_gate"] = proj(p + "mlp.shared_experts.gate_proj.weight")
                layer["shared_up"] = proj(p + "mlp.shared_experts.up_proj.weight")
                layer["shared_down"] = proj(p + "mlp.shared_experts.down_proj.weight")
            moe_layers.append(layer)

    head_key = "lm_head.weight" if "lm_head.weight" in state else "model.embed_tokens.weight"
    return {
        "embedding": jnp.asarray(_np(state["model.embed_tokens.weight"]), config.dtype),
        "layers_dense": _stack(dense_layers) if dense_layers else None,
        "layers_moe": _stack(moe_layers) if moe_layers else None,
        "final_norm": jnp.asarray(_np(state["model.norm.weight"]), config.dtype),
        "lm_head": quantize_linear(_np(state[head_key]).T.astype(np.float32), "bf16"),
        "rope_cache": deepseek_rope_cache(config),
    }
