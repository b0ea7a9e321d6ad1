# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pipeline parallelism: GPipe-schedule training over a "pipe" mesh axis.

TPU-native pipeline design (no NCCL send/recv threads, no stage
processes): layers are stacked (L, ...) arrays, so a pipeline stage is
just a *sharding of the leading layer axis* — stage s holds layers
[s*L/S, (s+1)*L/S). Activations move between neighbor stages with one
``ppermute`` per schedule tick inside a ``lax.scan``; the scan is
differentiable, so the backward pass is the exact transposed pipeline
(reverse ppermutes) with activations rematerialized from the scan
residuals — GPipe's fill-drain schedule with M microbatches and
M + S - 1 ticks.

Everything is SPMD: every stage runs the same program, gated by
``lax.axis_index("pipe")`` masks (embedding ingest on stage 0, loss on
stage S-1). Replicated leaves (embedding, lm_head, norms, rope cache)
get their gradient psum over "pipe" from the shard_map transpose.

The reference (stackav-oss/conch) has no distributed layer at all; this
implements SURVEY §2.8's pipeline row for the north-star training path.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from conch_tpu.models.llama import LlamaConfig
from conch_tpu.parallel.train import dense_layer_step


def stage_params(params: Any, num_stages: int) -> Any:
    """Reshape stacked layer leaves (L, ...) -> (S, L/S, ...) for sharding.

    Non-layer leaves (embedding, lm_head, norms, rope cache) are returned
    unchanged (they replicate across stages).
    """
    num_layers = jax.tree_util.tree_leaves(params["layers"])[0].shape[0]
    if num_layers % num_stages:
        msg = f"{num_layers} layers do not split into {num_stages} pipeline stages"
        raise ValueError(msg)
    out = dict(params)
    out["layers"] = jax.tree.map(
        lambda x: x.reshape(num_stages, num_layers // num_stages, *x.shape[1:]),
        params["layers"],
    )
    return out


def unstage_params(params: Any) -> Any:
    """Inverse of :func:`stage_params`: (S, L/S, ...) -> (L, ...)."""
    out = dict(params)
    out["layers"] = jax.tree.map(
        lambda x: x.reshape(x.shape[0] * x.shape[1], *x.shape[2:]), params["layers"]
    )
    return out


def pp_param_pspecs(staged_params: Any) -> Any:
    """PartitionSpecs: stage axis of layer stacks on "pipe", rest replicated."""

    def leaf_spec(path, leaf):
        path_str = jax.tree_util.keystr(path)
        if "layers" in path_str:
            return P(*(["pipe"] + [None] * (leaf.ndim - 1)))
        return P()

    return jax.tree_util.tree_map_with_path(leaf_spec, staged_params)


def make_pp_loss_fn(mesh: Mesh, config: LlamaConfig, num_microbatches: int):
    """Build ``loss(staged_params, tokens)`` pipelined over mesh axis "pipe".

    ``tokens`` is (batch, seq); the batch splits into ``num_microbatches``
    equal microbatches. Loss matches ``train.causal_lm_loss`` exactly
    (same mean over all next-token positions).
    """
    num_stages = mesh.shape["pipe"]
    layer_step = dense_layer_step(config)

    def local_loss(params, tokens):
        stage = jax.lax.axis_index("pipe")
        local_layers = jax.tree.map(lambda x: x[0], params["layers"])  # (L/S, ...)
        m = num_microbatches
        b, t = tokens.shape
        mb = b // m
        tokens_mb = tokens.reshape(m, mb, t)

        def norm(x, w):
            ms = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
            return (x * jax.lax.rsqrt(ms + config.rms_norm_eps)) * w.astype(jnp.float32)

        def embed(mb_tokens):
            return jnp.take(params["embedding"], mb_tokens, axis=0).astype(jnp.float32)

        def mb_loss(hidden, mb_tokens):
            hidden = norm(hidden, params["final_norm"]).astype(config.dtype)
            logits = params["lm_head"].apply(hidden.reshape(mb * t, -1))
            logits = logits.reshape(mb, t, -1).astype(jnp.float32)
            targets = mb_tokens[:, 1:]
            log_probs = jax.nn.log_softmax(logits[:, :-1], axis=-1)
            nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
            return jnp.mean(nll)

        def stage_fn(hidden):
            hidden, _ = jax.lax.scan(
                lambda h, layer: (layer_step(params, h, layer), None), hidden, local_layers
            )
            return hidden

        def tick(carry, tick_idx):
            h_recv, loss_sum = carry
            # Stage 0 ingests microbatch `tick_idx` (clamped; bubble ticks
            # produce activations whose loss tick falls past the scan end).
            ingest_idx = jnp.clip(tick_idx, 0, m - 1)
            ingest = embed(jax.lax.dynamic_index_in_dim(tokens_mb, ingest_idx, keepdims=False))
            h_in = jnp.where(stage == 0, ingest, h_recv)
            h_out = stage_fn(h_in)

            # Last stage finishes microbatch `tick_idx - (S-1)` this tick.
            done_idx = tick_idx - (num_stages - 1)
            valid = (stage == num_stages - 1) & (done_idx >= 0)
            mb_tokens = jax.lax.dynamic_index_in_dim(
                tokens_mb, jnp.clip(done_idx, 0, m - 1), keepdims=False
            )
            loss_sum = loss_sum + jnp.where(valid, mb_loss(h_out, mb_tokens), 0.0)

            # Hand the activation to the next stage (S-1 -> 0 wraps, but
            # stage 0 never reads h_recv, so the wrapped value is dead).
            h_next = jax.lax.ppermute(
                h_out, "pipe", [(i, (i + 1) % num_stages) for i in range(num_stages)]
            )
            return (h_next, loss_sum), None

        # The carry is device-varying (each stage holds its own activation
        # and loss accumulator): mark the initial value as such for the
        # replication (vma) checker.
        h0 = jax.lax.pcast(jnp.zeros((mb, t, config.hidden_size), jnp.float32), ("pipe",), to="varying")
        l0 = jax.lax.pcast(jnp.float32(0.0), ("pipe",), to="varying")
        (_, loss_sum), _ = jax.lax.scan(tick, (h0, l0), jnp.arange(m + num_stages - 1))
        # Loss lives on the last stage only: reduce to replicate.
        return jax.lax.psum(loss_sum, "pipe") / m

    def loss_fn(staged_params, tokens):
        specs = pp_param_pspecs(staged_params)
        # check_vma=True: replication is tracked, so the shard_map
        # transpose psums the cotangents of replicated leaves (embedding,
        # lm_head, norms) over "pipe" — grads come back correct without
        # manual reductions. (This path is jnp-only; no Pallas kernels
        # that would defeat the tracking.)
        return jax.shard_map(
            local_loss,
            mesh=mesh,
            in_specs=(specs, P()),
            out_specs=P(),
            check_vma=True,
        )(staged_params, tokens)

    return loss_fn


def make_pp_train_step(
    mesh: Mesh,
    config: LlamaConfig,
    params_example: Any,
    num_microbatches: int,
    learning_rate: float = 1e-3,
):
    """Pipelined train step: (staged+sharded params, opt_state, tokens) ->
    (params, opt_state, loss). Pass params through :func:`stage_params`
    then ``jax.device_put`` with the returned shardings first."""
    loss_fn = make_pp_loss_fn(mesh, config, num_microbatches)
    optimizer = optax.adamw(learning_rate)

    staged = stage_params(params_example, mesh.shape["pipe"])
    param_shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), pp_param_pspecs(staged),
        is_leaf=lambda x: isinstance(x, P),
    )

    def init_opt_state(staged_params):
        return optimizer.init(staged_params)

    def train_step(staged_params, opt_state, tokens):
        loss, grads = jax.value_and_grad(loss_fn)(staged_params, tokens)
        updates, opt_state = optimizer.update(grads, opt_state, staged_params)
        staged_params = optax.apply_updates(staged_params, updates)
        return staged_params, opt_state, loss

    jitted = jax.jit(train_step, donate_argnums=(0, 1))
    return jitted, init_opt_state, param_shardings
