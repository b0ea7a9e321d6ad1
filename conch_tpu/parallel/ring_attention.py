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


def _ring_attention_local(q, k, v, *, axis_name: str, scale: float, causal: bool):
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
        if causal:
            q_pos = my_idx * t_local + jnp.arange(t_local)
            k_pos = src * t_local + jnp.arange(t_local)
            mask = q_pos[:, None] >= k_pos[None, :]
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


def make_ring_attention(mesh: Mesh, *, scale: float, causal: bool = True, axis_name: str = "seq"):
    """Build jitted ring attention over ``mesh``'s ``axis_name`` axis.

    Takes globally-shaped (batch, seq, heads, head_dim) q/k/v with the
    sequence dimension sharded over ``axis_name``; returns attention
    output with the same layout. ``seq`` must divide evenly by the axis
    size (pad the prompt to the shard multiple, as the paged engine
    already does for pages).
    """
    local = functools.partial(
        _ring_attention_local, axis_name=axis_name, scale=scale, causal=causal
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
