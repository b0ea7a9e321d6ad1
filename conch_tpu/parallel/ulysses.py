# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Ulysses sequence parallelism (all-to-all head/sequence re-sharding).

The second sequence-parallel scheme from SURVEY §2.8 (alongside ring
attention): instead of rotating K/V blocks, two ``all_to_all``s re-shard
the activations so every chip sees the FULL sequence for a slice of the
heads, computes ordinary (full-context) attention locally, then swaps
back to sequence sharding for the rest of the layer (DeepSpeed-Ulysses,
Jacobs et al. 2023, re-derived for ``shard_map``).

Trade-off vs the ring: Ulysses moves activations twice per layer over
ICI (volume independent of the ring's step count) and keeps attention a
single dense local computation — better when heads >> chips and the
per-chip sequence is short; the ring wins when the KV cache dominates
(it never re-shards Q) and overlaps transfer with compute. Both compose
with the same mesh axis.

GQA: queries split their head dim across chips; K/V split KV heads, so
``num_kv_heads`` must divide by the axis size (replicate K/V across the
axis with ``num_kv_heads == axis size`` groups otherwise).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _local_gqa_attention(q, k, v, *, scale: float, causal: bool):
    """Full-sequence attention on local head slices.

    q: (b, s, hq, d); k/v: (b, s, hkv, d) with hq % hkv == 0.
    """
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    qf = q.astype(jnp.float32).reshape(b, s, hkv, group, d) * scale
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qf, k.astype(jnp.float32))
    if causal:
        mask = jnp.tril(jnp.ones((s, s), bool))
        scores = jnp.where(mask[None, None, None], scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", p, v.astype(jnp.float32))
    return out.reshape(b, s, hq, d).astype(q.dtype)


def _ulysses_local(q, k, v, *, axis_name: str, scale: float, causal: bool):
    """Per-chip body: q/k/v are (batch, local_seq, heads, head_dim) shards."""
    # seq-sharded -> head-sharded: split heads across chips, gather the
    # full sequence (chips concat in ring order == global positions).
    a2a = functools.partial(jax.lax.all_to_all, axis_name=axis_name, tiled=True)
    q_full = a2a(q, split_axis=2, concat_axis=1)
    k_full = a2a(k, split_axis=2, concat_axis=1)
    v_full = a2a(v, split_axis=2, concat_axis=1)

    out = _local_gqa_attention(q_full, k_full, v_full, scale=scale, causal=causal)

    # head-sharded -> seq-sharded (inverse all-to-all).
    return a2a(out, split_axis=1, concat_axis=2)


def make_ulysses_attention(mesh: Mesh, *, scale: float, causal: bool = True, axis_name: str = "seq"):
    """Build jitted Ulysses attention over ``mesh``'s ``axis_name`` axis.

    Same contract as :func:`make_ring_attention`: globally-shaped
    (batch, seq, heads, head_dim) q and (batch, seq, kv_heads, head_dim)
    k/v with the sequence dimension sharded over ``axis_name``; both
    head counts must divide by the axis size.
    """
    n = mesh.shape[axis_name]

    local = functools.partial(
        _ulysses_local, axis_name=axis_name, scale=scale, causal=causal
    )
    spec = P(None, axis_name, None, None)

    def apply(q, k, v):
        if q.shape[2] % n or k.shape[2] % n:
            msg = (
                f"Ulysses needs q heads ({q.shape[2]}) and kv heads "
                f"({k.shape[2]}) divisible by the '{axis_name}' axis size {n}"
            )
            raise ValueError(msg)
        return jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)(q, k, v)

    return jax.jit(apply)
