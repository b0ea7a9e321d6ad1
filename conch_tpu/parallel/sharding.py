# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tensor-parallel sharding rules for Llama-family params and KV caches.

Megatron-style layout over the ("data", "model") mesh:

- column-parallel: wq/wk/wv (attention heads) and w_gate/w_up (MLP
  columns) shard their output (N) dimension on "model" — including the
  *packed* int32 weights and their per-group scales, which share the N
  dimension (the north-star requirement that quantized weights shard
  consistently);
- row-parallel: wo and w_down shard their input (K) dimension on "model";
  their partial outputs are reduced with one ``psum`` over ICI per layer
  (inserted by the shard_map step in ``tp_inference.py`` or by GSPMD in
  the training step);
- lm_head: column-parallel over the vocab;
- KV caches: sharded on the kv-head dimension — each chip owns the full
  sequence for its heads, so paged attention needs no cross-chip
  communication at all;
- norms, embedding, rope cache: replicated.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _spec_for(path: str, ndim: int) -> P:
    """PartitionSpec for a param leaf, identified by its tree path.

    Stacked layer weights carry a leading L dimension; the rules below
    index from the right so they hold with or without stacking.
    """

    def last_on_model():
        return P(*([None] * (ndim - 1) + ["model"]))

    def second_last_on_model():
        return P(*([None] * (ndim - 2) + ["model", None]))

    # MoE (Mixtral) layers: the router is replicated; expert stacks
    # (L, E, H, F) shard the *expert* dimension on "model" (expert
    # parallelism) — GSPMD keeps dispatch local per expert shard and
    # all-reduces the combine einsum's contraction.
    if "router" in path:
        return P()
    if ndim >= 4 and any(k in path for k in ("w_gate", "w_up", "w_down")):
        return P(*([None] * (ndim - 3) + ["model", None, None]))

    # DeepSeek-V2 (MLA): q_a feeds a full-vector RMSNorm and kv_a is the
    # MQA-shared latent projection -> replicated; the absorbed per-head
    # W_uk/W_uv shard the HEAD dimension; routed expert stacks
    # (L, E, H, F) shard the expert dimension (same geometry as Mixtral);
    # shared experts are ordinary column/row-parallel MLP projections.
    if any(k in path for k in ("wq_a", "q_a_norm", "w_kv_a", "kv_a_norm")):
        return P()
    if "w_uk" in path or "w_uv" in path:
        return P(*([None] * (ndim - 3) + ["model", None, None]))
    if ndim >= 4 and any(k in path for k in ("e_gate", "e_up", "e_down")):
        return P(*([None] * (ndim - 3) + ["model", None, None]))

    # w8a8 per-output-channel scales are (N,): they follow N — sharded
    # under column-parallel, replicated under row-parallel (where K is
    # the sharded dimension and every chip keeps all N columns). Checked
    # BEFORE the weight-name rules so a row-parallel projection's 1-D
    # scales never pick up a rank-2 spec.
    if "out_scales" in path:
        if any(k in path for k in ("wq", "wk", "wv", "w_gate", "w_up", "lm_head", "shared_gate", "shared_up")):
            return last_on_model()
        return P()

    if "shared_gate" in path or "shared_up" in path:
        return last_on_model()
    if "shared_down" in path:
        return second_last_on_model()

    # Qwen2 attention biases are (N,) on the column-parallel outputs:
    # each chip adds its local head slice's bias.
    if any(k in path for k in ("bq", "bk", "bv")):
        return last_on_model()

    # nf4 storage is K-grouped (K//8, N) packed + (K//g, N) absmax — the
    # same geometry as int4 packed/scales — so the generic rules apply.
    if any(k in path for k in ("wq", "wk", "wv", "w_gate", "w_up", "lm_head")):
        return last_on_model()  # column-parallel: N (incl. packed/scales)
    if any(k in path for k in ("wo", "w_down")):
        # Row-parallel: K for the weight, K-groups for packed words and
        # per-group scales (all share the K-major leading layout).
        return second_last_on_model()
    return P()  # norms, embedding, cos_sin: replicated


def llama_param_shardings(params: Any, mesh: Mesh) -> Any:
    """Build a NamedSharding pytree matching ``params``."""

    def leaf_sharding(path, leaf):
        path_str = jax.tree_util.keystr(path)
        return NamedSharding(mesh, _spec_for(path_str, leaf.ndim))

    return jax.tree_util.tree_map_with_path(leaf_sharding, params)


def llama_param_pspecs(params: Any) -> Any:
    """PartitionSpec pytree (for shard_map in_specs)."""

    def leaf_spec(path, leaf):
        return _spec_for(jax.tree_util.keystr(path), leaf.ndim)

    return jax.tree_util.tree_map_with_path(leaf_spec, params)


def shard_llama_params(params: Any, mesh: Mesh) -> Any:
    """Place params on the mesh according to the TP rules."""
    fused_keys = ("wqkv", "w_gateup", "wq_kva", "shared_gateup")
    if isinstance(params, dict):
        for stack in ("layers", "layers_dense", "layers_moe"):
            layers = params.get(stack)
            if isinstance(layers, dict) and any(k in layers for k in fused_keys):
                # Naive column-parallel sharding of a fused [q|k|v] weight
                # would give chip 0 the first N/tp columns — q columns
                # only, not a (q, k, v) head shard. Shard per-name params,
                # then fuse each chip's local shards
                # (models.llama.fuse_llama_params_sharded).
                msg = "shard_llama_params requires UNFUSED params (wq/wk/wv, w_gate/w_up)"
                raise ValueError(msg)
    return jax.device_put(params, llama_param_shardings(params, mesh))


def _lora_spec_for(path: str, ndim: int) -> P:
    """PartitionSpec for a stacked multi-LoRA leaf (models/lora.py).

    Geometry: ``a`` is (L, A, K, r), ``b`` is (L, A, r, N), scales (A,).
    Column-parallel targets (wq/wk/wv/w_gate/w_up) shard ``b``'s output
    dim; row-parallel targets (wo/w_down) shard ``a``'s input dim — the
    low-rank delta then flows through the SAME psum as the base matmul
    (it is added before the reduction in the layer step). The rank dim
    never shards.
    """
    if ndim <= 1:  # scales
        return P()
    row_parallel = "wo" in path or "w_down" in path
    if path.endswith("['a']"):
        if row_parallel:
            return P(*([None] * (ndim - 2) + ["model", None]))  # K
        return P()
    if path.endswith("['b']"):
        if row_parallel:
            return P()
        return P(*([None] * (ndim - 1) + ["model"]))  # N
    return P()


def lora_pspecs(lora: Any) -> Any:
    """PartitionSpec pytree for a stacked adapter set (shard_map in_specs)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: _lora_spec_for(jax.tree_util.keystr(path), leaf.ndim), lora
    )


def shard_lora(lora: Any, mesh: Mesh) -> Any:
    """Place a stacked adapter set on the mesh by the TP LoRA rules."""
    shardings = jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _lora_spec_for(jax.tree_util.keystr(path), leaf.ndim)),
        lora,
    )
    return jax.device_put(lora, shardings)


def kv_cache_pspec() -> P:
    """(L, P, KH, ps, D) caches shard the kv-head dimension."""
    return P(None, None, "model", None, None)


def kv_cache_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, kv_cache_pspec())
