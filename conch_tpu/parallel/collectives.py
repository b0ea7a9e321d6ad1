# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Collective-compute overlap primitives for tensor parallelism.

The north-star "ICI all-gather/reduce-scatter overlapped with dequant+
matmul compute" (BASELINE.json): instead of all-gather *then* matmul, the
ring formulations below interleave one ``ppermute`` hop with one partial
matmul per step, so XLA's latency-hiding scheduler can run each hop's DMA
concurrently with the previous chunk's MXU work (the "collective matmul"
from the TPU scaling playbook).

All functions are written for use inside ``shard_map`` over a named mesh
axis and are backend-agnostic (lax collectives), so they are testable on
a virtual CPU mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _ring_perm(axis_name: str, shift: int = 1):
    n = jax.lax.axis_size(axis_name)
    return [(i, (i + shift) % n) for i in range(n)]


def ring_all_gather(x: jax.Array, axis_name: str) -> jax.Array:
    """All-gather along ``axis_name`` via n-1 ring hops (concat on axis 0).

    Equivalent to ``lax.all_gather(x, axis_name, tiled=True)`` but
    expressed as an explicit ring so each hop can overlap with consumer
    compute when inlined into a larger computation.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    chunks = [x]
    cur = x
    for _ in range(n - 1):
        cur = jax.lax.ppermute(cur, axis_name, _ring_perm(axis_name))
        chunks.append(cur)
    # chunks[j] is the shard of device (idx - j) mod n; reorder to global.
    stacked = jnp.stack(chunks)  # (n, *x.shape), entry j = shard (idx - j) % n
    offsets = (idx - jnp.arange(n)) % n  # shard id of entry j
    inv = jnp.argsort(offsets)  # position of shard s in `chunks`
    return jnp.take(stacked, inv, axis=0).reshape((n * x.shape[0],) + x.shape[1:])


def overlapped_allgather_matmul(x_shard: jax.Array, w_local: jax.Array, axis_name: str) -> jax.Array:
    """Compute ``all_gather(x, K axis) @ w_local`` with ring overlap.

    Args:
        x_shard: (m, k_local) - this chip's K-shard of the activations.
        w_local: (k_global, n_local) - this chip's column shard of the
            weight, with the FULL contraction dimension.
        axis_name: tensor-parallel mesh axis.

    Returns:
        (m, n_local): identical to gathering x fully then multiplying, but
        each ring hop's transfer overlaps the previous chunk's matmul.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    k_local = x_shard.shape[1]

    def w_rows(shard_id):
        # Rows of w corresponding to shard `shard_id` of the K dimension.
        return jax.lax.dynamic_slice_in_dim(w_local, shard_id * k_local, k_local, axis=0)

    acc = jnp.dot(x_shard, w_rows(idx), preferred_element_type=jnp.float32)
    cur = x_shard
    for hop in range(1, n):
        cur = jax.lax.ppermute(cur, axis_name, _ring_perm(axis_name))
        src = (idx - hop) % n  # whose shard we now hold
        acc = acc + jnp.dot(cur, w_rows(src), preferred_element_type=jnp.float32)
    return acc.astype(x_shard.dtype)


def overlapped_matmul_reduce_scatter(x_local: jax.Array, w_shard: jax.Array, axis_name: str) -> jax.Array:
    """Compute ``reduce_scatter(x_local @ w_shard, N axis)`` with ring overlap.

    Args:
        x_local: (m, k_local) - this chip's K-shard of the activations.
        w_shard: (k_local, n_global) - this chip's K-shard (row-parallel)
            of the weight with the FULL output dimension.
        axis_name: tensor-parallel mesh axis.

    Returns:
        (m, n_global // n_devices): this chip's N-shard of the summed
        product. Each partial product is computed just before the ring
        hop that carries the accumulating slice, overlapping MXU and ICI.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    n_global = w_shard.shape[1]
    n_local = n_global // n

    def w_cols(block_id):
        return jax.lax.dynamic_slice_in_dim(w_shard, block_id * n_local, n_local, axis=1)

    # Accumulating slice walks the ring: start with the block destined for
    # the farthest device, add our contribution at each hop.
    acc = None
    for hop in range(n - 1, -1, -1):
        dst = (idx + hop) % n  # block that will land on device dst
        partial = jnp.dot(x_local, w_cols(dst), preferred_element_type=jnp.float32)
        acc = partial if acc is None else acc + partial
        if hop > 0:
            acc = jax.lax.ppermute(acc, axis_name, _ring_perm(axis_name))
    return acc.astype(x_local.dtype)
