# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Sharded causal-LM training step (GSPMD over the device mesh).

The multi-chip validation path: dense full-attention Llama forward, causal
cross-entropy loss, grad, and an Adam-style update — jitted with sharding
annotations so XLA inserts the collectives (grad psums over "data" on DCN,
activation/weight collectives over "model" on ICI).

Training uses a dense-attention forward (no paged cache: whole sequences),
with the sequence dimension of activations shardable over "model"
(sequence parallelism for the norm/elementwise segments).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conch_tpu.models.llama import LlamaConfig
from conch_tpu.parallel.sharding import llama_param_shardings
from conch_tpu.reference.embedding.rotary_embedding import rotary_embedding as rope_apply


def dense_layer_step(config: LlamaConfig, lora_scale: float | None = None):
    """One dense-attention transformer layer on (batch, seq, hidden) f32.

    Shared by the GSPMD train step below and the pipeline-parallel stages
    (``parallel/pipeline.py``): ``step(params, hidden, layer) -> hidden``.

    ``lora_scale`` switches on single-adapter LoRA (fine-tuning): the
    per-layer A/B factors ride the scanned layer dict under ``"__lora__"``
    and each targeted projection adds ``scale * (x @ A) @ B``.
    """

    def norm(x, w):
        ms = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + config.rms_norm_eps)) * w.astype(jnp.float32)

    def layer_step(params, hidden, layer):
        lora_layer = layer.get("__lora__")

        def proj(name, x):
            y = layer[name].apply(x)
            if lora_layer is not None and name in lora_layer:
                from conch_tpu.models.lora import lora_delta_single

                ab = lora_layer[name]
                y = (
                    y.astype(jnp.float32)
                    + lora_delta_single(x, ab["a"], ab["b"], lora_scale)
                ).astype(y.dtype)
            return y

        b, t, h = hidden.shape
        positions = jnp.arange(t, dtype=jnp.int32)
        x = norm(hidden, layer["input_norm"]).astype(config.dtype)
        flat = x.reshape(b * t, h)
        q = proj("wq", flat)
        k = proj("wk", flat)
        v = proj("wv", flat)

        # Rope per sequence (same positions for every batch row).
        qr, kr = rope_apply(
            jnp.tile(positions, b), q, k, params["cos_sin_cache"], config.head_dim, config.head_dim
        )
        qh = qr.reshape(b, t, config.num_heads, config.head_dim).astype(jnp.float32)
        kh = kr.reshape(b, t, config.num_kv_heads, config.head_dim).astype(jnp.float32)
        vh = v.reshape(b, t, config.num_kv_heads, config.head_dim).astype(jnp.float32)

        group = config.num_heads // config.num_kv_heads
        kh = jnp.repeat(kh, group, axis=2)
        vh = jnp.repeat(vh, group, axis=2)

        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / jnp.sqrt(float(config.head_dim))
        causal = jnp.tril(jnp.ones((t, t), bool))
        if config.sliding_window > 0:
            # Train with the same window the serving path applies.
            causal &= ~jnp.tril(jnp.ones((t, t), bool), -config.sliding_window)
        s = jnp.where(causal[None, None], s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(b * t, -1).astype(config.dtype)
        hidden = hidden + proj("wo", attn).reshape(b, t, h).astype(jnp.float32)

        x = norm(hidden, layer["post_attn_norm"]).astype(config.dtype).reshape(b * t, h)
        gate = proj("w_gate", x).astype(jnp.float32)
        up = proj("w_up", x).astype(jnp.float32)
        act = (gate * jax.nn.sigmoid(gate)).astype(config.dtype) * up.astype(config.dtype)
        hidden = hidden + proj("w_down", act).reshape(b, t, h).astype(jnp.float32)
        return hidden

    return layer_step


def dense_forward(
    params: Any, config: LlamaConfig, token_ids: jax.Array, remat: bool = False,
    lora_layers: Any = None, lora_scale: float = 1.0,
) -> jax.Array:
    """Full-context forward over (batch, seq) token ids; returns logits.

    ``remat=True`` wraps each layer in ``jax.checkpoint``: the backward
    pass recomputes layer activations instead of storing them — O(1)
    layers of activation memory, the standard FLOPs-for-HBM trade that
    makes long-context/deep training fit.

    ``lora_layers`` (per-layer stacked {target: {"a", "b"}}) applies one
    LoRA adapter to every token — the fine-tuning forward.
    """
    b, t = token_ids.shape
    h = config.hidden_size
    hidden = jnp.take(params["embedding"], token_ids, axis=0).astype(jnp.float32)

    def norm(x, w):
        ms = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + config.rms_norm_eps)) * w.astype(jnp.float32)

    layer_step = dense_layer_step(config, lora_scale=lora_scale if lora_layers is not None else None)
    if remat:
        layer_step = jax.checkpoint(layer_step)
    layers = params["layers"]
    if lora_layers is not None:
        layers = {**layers, "__lora__": lora_layers}
    hidden, _ = jax.lax.scan(lambda hh, layer: (layer_step(params, hh, layer), None), hidden, layers)
    hidden = norm(hidden, params["final_norm"]).astype(config.dtype)
    logits = params["lm_head"].apply(hidden.reshape(b * t, h))
    return logits.reshape(b, t, -1).astype(jnp.float32)


def causal_lm_loss(
    params: Any, config: LlamaConfig, token_ids: jax.Array, remat: bool = False,
    lora_layers: Any = None, lora_scale: float = 1.0,
) -> jax.Array:
    """Next-token cross entropy over (batch, seq) token ids."""
    logits = dense_forward(
        params, config, token_ids, remat=remat,
        lora_layers=lora_layers, lora_scale=lora_scale,
    )
    targets = token_ids[:, 1:]
    log_probs = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def make_train_step(mesh: Mesh, config: LlamaConfig, params_example: Any, learning_rate: float = 1e-3, remat: bool = False):
    """Build (train_step, init_opt_state) sharded over the mesh.

    Shardings: params TP over "model" (Megatron layout), batch DP over
    "data"; optimizer state inherits the param shardings. XLA/GSPMD
    inserts the grad all-reduce over "data" and the activation
    collectives over "model".
    """
    optimizer = optax.adamw(learning_rate)
    param_shardings = llama_param_shardings(params_example, mesh)
    batch_sharding = NamedSharding(mesh, P("data", None))

    def init_opt_state(params):
        return optimizer.init(params)

    def train_step(params, opt_state, token_ids):
        loss, grads = jax.value_and_grad(lambda p: causal_lm_loss(p, config, token_ids, remat=remat))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    opt_shardings = None  # filled lazily: optimizer state mirrors params

    jitted = jax.jit(
        train_step,
        in_shardings=(param_shardings, None, batch_sharding),
        # Pin output param shardings to the input layout: without this,
        # GSPMD may emit a param (e.g. the replicated cos_sin cache) with a
        # different layout than the next step's in_shardings expect.
        out_shardings=(param_shardings, None, None),
        donate_argnums=(0, 1),
    )
    return jitted, init_opt_state, param_shardings, batch_sharding


def make_lora_train_step(
    mesh: Mesh, config: LlamaConfig, params_example: Any, adapter_example: dict,
    learning_rate: float = 1e-3, remat: bool = False,
):
    """Parameter-efficient fine-tuning: train ONE LoRA adapter, base frozen.

    Gradients flow only into the adapter's A/B factors (the base params
    are a closed-over constant of the loss), so optimizer state is
    O(rank) — the whole point of LoRA fine-tuning. Shardings: the base
    params take the Megatron TP layout, the adapter factors the matching
    LoRA rules (``sharding.lora_pspecs`` geometry: a on K for
    row-parallel targets, b on N for column-parallel), batch DP over
    "data".

    Returns ``(train_step, init_opt_state, shardings)`` where
    ``train_step(params, lora_layers, opt_state, token_ids) ->
    (lora_layers, opt_state, loss)`` and ``shardings = (param, lora,
    batch)`` NamedSharding trees. ``adapter_example`` is one adapter from
    ``models.lora.init_lora_adapter`` (its ``scale`` is baked in).
    """
    from conch_tpu.parallel.sharding import _lora_spec_for

    optimizer = optax.adamw(learning_rate)
    scale = adapter_example["scale"]
    param_shardings = llama_param_shardings(params_example, mesh)
    lora_shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _lora_spec_for(jax.tree_util.keystr(path), leaf.ndim)),
        adapter_example["layers"],
    )
    batch_sharding = NamedSharding(mesh, P("data", None))

    def init_opt_state(lora_layers):
        return optimizer.init(lora_layers)

    def train_step(params, lora_layers, opt_state, token_ids):
        def loss_fn(ll):
            return causal_lm_loss(
                params, config, token_ids, remat=remat,
                lora_layers=ll, lora_scale=scale,
            )

        loss, grads = jax.value_and_grad(loss_fn)(lora_layers)
        updates, opt_state = optimizer.update(grads, opt_state, lora_layers)
        lora_layers = optax.apply_updates(lora_layers, updates)
        return lora_layers, opt_state, loss

    jitted = jax.jit(
        train_step,
        in_shardings=(param_shardings, lora_shardings, None, batch_sharding),
        out_shardings=(lora_shardings, None, None),
        donate_argnums=(1, 2),
    )
    return jitted, init_opt_state, (param_shardings, lora_shardings, batch_sharding)
