# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Sequence-parallel (ring) attention for long-context prefill.

Context parallelism the TPU way: the sequence dimension is sharded over a
"seq" mesh axis, each chip holds its Q/K/V shard, and K/V blocks rotate
around the ring with one ``ppermute`` per step while a running online
softmax (max, sum, weighted accumulator) folds each arriving block in —
attention over a context S times longer than any one chip could hold,
with compute and ICI transfer overlapped by XLA's async collectives.
FlashAttention's streaming-softmax recurrence makes the merge exact, so
the result is bit-close to dense attention over the gathered sequence.

Causality over the ring: chip i's queries may only attend K/V originating
from chips j <= i, and within chip i's own block the mask is triangular.
Block provenance is tracked with the rotating step index, so masking is
two compares — no (S, S) mask materialization anywhere.

The reference (stackav-oss/conch) has no distributed attention; this is
the SURVEY §2.8 sequence-parallel row (Ring Attention, Liu et al. 2023,
re-derived for shard_map + ppermute).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _ring_attention_local(q, k, v, *, axis_name: str, scale: float, causal: bool, window: int = 0):
    """Per-chip body: q (batch, local_seq, heads, head_dim) and k/v
    (batch, local_seq, kv_heads, head_dim) shards; GQA repeats each KV
    head over its query group at score time (never materialized in HBM).
    """
    num_chips = jax.lax.axis_size(axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, t_local, h, d = q.shape
    group = h // k.shape[2]

    qf = q.astype(jnp.float32) * scale
    perm = [(i, (i + 1) % num_chips) for i in range(num_chips)]

    def step(carry, _):
        kv, src, m, l, acc = carry
        kb, vb = kv
        # Scores for the resident K/V block (which originated on chip `src`).
        kb_r = jnp.repeat(kb, group, axis=2) if group > 1 else kb
        s = jnp.einsum("bqhd,bkhd->bhqk", qf, kb_r.astype(jnp.float32))
        if causal or window > 0:
            q_pos = my_idx * t_local + jnp.arange(t_local)
            k_pos = src * t_local + jnp.arange(t_local)
            mask = jnp.ones((t_local, t_local), bool)
            if causal:
                mask &= q_pos[:, None] >= k_pos[None, :]
            if window > 0:
                mask &= k_pos[None, :] > q_pos[:, None] - window
            s = jnp.where(mask[None, None], s, -jnp.inf)

        # Online-softmax merge (FlashAttention recurrence).
        block_max = jnp.max(s, axis=-1)  # (b, h, q)
        new_m = jnp.maximum(m, block_max)
        # All-masked rows keep -inf max: exp(-inf - -inf) would be NaN.
        safe_m = jnp.where(jnp.isneginf(new_m), 0.0, new_m)
        p = jnp.exp(s - safe_m[..., None])
        p = jnp.where(jnp.isneginf(s), 0.0, p)
        correction = jnp.where(jnp.isneginf(m), 0.0, jnp.exp(m - safe_m))
        l = l * correction + jnp.sum(p, axis=-1)
        vb_r = jnp.repeat(vb, group, axis=2) if group > 1 else vb
        acc = acc * correction[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, vb_r.astype(jnp.float32)
        )

        # Rotate the K/V block (and its provenance) one hop up the ring.
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        src = jax.lax.ppermute(src, axis_name, perm)
        return ((kb, vb), src, new_m, l, acc), None

    # The accumulators are device-varying (each chip owns its query
    # shard's statistics): mark them for the replication (vma) checker.
    varying = lambda x: jax.lax.pcast(x, (axis_name,), to="varying")  # noqa: E731
    m0 = varying(jnp.full((b, h, t_local), -jnp.inf, jnp.float32))
    l0 = varying(jnp.zeros((b, h, t_local), jnp.float32))
    acc0 = varying(jnp.zeros((b, h, t_local, d), jnp.float32))
    init = ((k, v), my_idx, m0, l0, acc0)
    (_, _, _, l, acc), _ = jax.lax.scan(step, init, None, length=num_chips)

    out = acc / jnp.maximum(l, 1e-30)[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # (b, t_local, h, d)


def make_ring_attention(mesh: Mesh, *, scale: float, causal: bool = True, axis_name: str = "seq", window: int = 0):
    """Build jitted ring attention over ``mesh``'s ``axis_name`` axis.

    Takes globally-shaped (batch, seq, heads, head_dim) q/k/v with the
    sequence dimension sharded over ``axis_name``; returns attention
    output with the same layout. ``seq`` must divide evenly by the axis
    size (pad the prompt to the shard multiple, as the paged engine
    already does for pages).
    """
    local = functools.partial(
        _ring_attention_local, axis_name=axis_name, scale=scale, causal=causal, window=window
    )
    spec = P(None, axis_name, None, None)
    return jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    )


def dense_attention_reference(q, k, v, *, scale: float, causal: bool = True):
    """Single-device oracle: plain softmax attention, same layout."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale, k.astype(jnp.float32))
    if causal:
        t = q.shape[1]
        mask = jnp.tril(jnp.ones((t, t), bool))
        s = jnp.where(mask[None, None], s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bhqd", p, v.astype(jnp.float32))
    return out.transpose(0, 2, 1, 3).astype(q.dtype)


def _seq_parallel_loss_local(params, token_ids, *, config, axis_name: str, remat: bool = False):
    """Per-shard causal-LM loss body: ``token_ids`` is the (batch, t_local)
    shard of a globally (batch, seq)-shaped batch; attention runs over the
    ring (full effective context), everything else is token-local. The
    returned scalar is the GLOBAL mean next-token NLL (psum-reduced), so
    differentiating the shard_map-wrapped version yields exact full-context
    gradients — long-context training where no chip ever holds the whole
    sequence.
    """
    import math

    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    b, t_local = token_ids.shape
    h = config.hidden_size
    positions_g = idx * t_local + jnp.arange(t_local, dtype=jnp.int32)

    from conch_tpu.reference.embedding.rotary_embedding import rotary_embedding as rope_apply

    def norm(x, w):
        ms = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(ms + config.rms_norm_eps)) * w.astype(jnp.float32)

    hidden = jnp.take(params["embedding"], token_ids, axis=0).astype(jnp.float32)
    scale = 1.0 / math.sqrt(config.head_dim)

    def layer_step(hidden, layer):
        x = norm(hidden, layer["input_norm"]).astype(config.dtype)
        flat = x.reshape(b * t_local, h)
        q = layer["wq"].apply(flat)
        k = layer["wk"].apply(flat)
        v = layer["wv"].apply(flat)
        q, k = rope_apply(
            jnp.tile(positions_g, b), q, k, params["cos_sin_cache"],
            config.head_dim, config.head_dim,
        )
        qh = q.reshape(b, t_local, config.num_heads, config.head_dim)
        kh = k.reshape(b, t_local, config.num_kv_heads, config.head_dim)
        vh = v.reshape(b, t_local, config.num_kv_heads, config.head_dim)
        attn = _ring_attention_local(
            qh, kh, vh, axis_name=axis_name, scale=scale, causal=True,
            window=config.sliding_window,
        )
        hidden = hidden + layer["wo"].apply(
            attn.reshape(b * t_local, -1).astype(config.dtype)
        ).reshape(b, t_local, h).astype(jnp.float32)

        x = norm(hidden, layer["post_attn_norm"]).astype(config.dtype).reshape(b * t_local, h)
        gate = layer["w_gate"].apply(x).astype(jnp.float32)
        up = layer["w_up"].apply(x).astype(jnp.float32)
        act = (gate * jax.nn.sigmoid(gate)).astype(config.dtype) * up.astype(config.dtype)
        hidden = hidden + layer["w_down"].apply(act).reshape(b, t_local, h).astype(jnp.float32)
        return hidden

    step = jax.checkpoint(layer_step) if remat else layer_step
    hidden, _ = jax.lax.scan(
        lambda hh, layer: (step(hh, layer), None), hidden, params["layers"]
    )
    hidden = norm(hidden, params["final_norm"]).astype(config.dtype)
    logits = params["lm_head"].apply(hidden.reshape(b * t_local, h))
    logits = logits.reshape(b, t_local, -1).astype(jnp.float32)

    # Each shard's last target is the NEXT shard's first token.
    perm = [((i + 1) % n, i) for i in range(n)]
    next_first = jax.lax.ppermute(token_ids[:, :1], axis_name, perm)
    targets = jnp.concatenate([token_ids[:, 1:], next_first], axis=1)
    valid = (positions_g < n * t_local - 1)[None, :]

    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, targets[..., None], axis=-1)[..., 0]
    total = jax.lax.psum(jnp.sum(nll * valid), axis_name)
    count = jax.lax.psum(jnp.sum(valid.astype(jnp.float32)) * b, axis_name)
    return total / count


def make_seq_parallel_train_step(mesh: Mesh, config, params_example, learning_rate: float = 1e-3, axis_name: str = "seq", remat: bool = True):
    """Long-context training: sequence sharded over ``axis_name``, ring
    attention carrying the cross-shard context, params replicated.

    Returns ``(train_step, init_opt_state, batch_sharding)`` with
    ``train_step(params, opt_state, token_ids) -> (params, opt_state, loss)``
    for globally-shaped (batch, seq) token ids. Gradients are exact
    full-context gradients (the ring and its ``ppermute``s are
    differentiable); each chip holds 1/n of every activation, which is
    what makes context lengths beyond one chip's HBM trainable at all.
    """
    import functools

    import optax
    from jax.sharding import NamedSharding

    optimizer = optax.adamw(learning_rate)
    local = functools.partial(
        _seq_parallel_loss_local, config=config, axis_name=axis_name, remat=remat
    )
    loss_fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, axis_name)),
        out_specs=P(),
        check_vma=False,
    )

    def init_opt_state(params):
        return optimizer.init(params)

    def train_step(params, opt_state, token_ids):
        loss, grads = jax.value_and_grad(lambda p: loss_fn(p, token_ids))(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    batch_sharding = NamedSharding(mesh, P(None, axis_name))
    jitted = jax.jit(train_step, donate_argnums=(0, 1))
    return jitted, init_opt_state, batch_sharding
