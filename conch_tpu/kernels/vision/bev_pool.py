# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""BEVPool: interval sum-pooling onto a 3D voxel grid, with custom VJP.

TPU-native re-design of the reference Triton kernels
(``conch/kernels/vision/bev_pool.py:238-329``, BEVFusion "quick cumsum"
lineage). The reference loops points per interval inside each program;
on TPU the same computation is a *segment sum*: each point is labeled
with its interval id (one vectorized ``searchsorted``), summed with
``jax.ops.segment_sum`` (an XLA scatter-add that TPUs execute natively),
and scattered to the grid cell named by the interval's first geometry
entry. The backward pass broadcasts each cell's gradient to all points of
its interval (reference ``:226-235``) - a gather, no atomics.

Geometry convention (reference ``bev_pool.py:108-124``):
``geom_feats[:, 0..3] = (x, y, z, batch)``; output layout
``(batch, grid_z, grid_x, grid_y, channels)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _point_interval_ids(interval_starts: jax.Array, interval_lengths: jax.Array, num_points: int):
    """Label each point with its interval id (-NUM for points outside any interval)."""
    point_ids = jnp.arange(num_points, dtype=jnp.int32)
    seg = jnp.searchsorted(interval_starts.astype(jnp.int32), point_ids, side="right").astype(jnp.int32) - 1
    seg = jnp.clip(seg, 0, interval_starts.shape[0] - 1)
    within = (point_ids >= interval_starts[seg]) & (point_ids < interval_starts[seg] + interval_lengths[seg])
    return seg, within


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7))
def bev_pool(
    image_feats: jax.Array,
    geom_feats: jax.Array,
    interval_starts,
    interval_lengths,
    batch_size: int,
    grid_cells_z: int,
    grid_cells_x: int,
    grid_cells_y: int,
) -> jax.Array:
    """Sum image features within each interval and scatter to the BEV grid.

    Args:
        image_feats: (num_points, channels).
        geom_feats: (num_points, 4) int (x, y, z, batch) per point.
        interval_starts/interval_lengths: (num_intervals,) run-length
            encoding of points sharing a grid cell.
        batch_size, grid_cells_z/x/y: output grid dimensions.

    Returns:
        (batch, grid_z, grid_x, grid_y, channels) pooled features.
    """
    return _bev_pool_fwd_impl(
        image_feats, geom_feats, interval_starts, interval_lengths,
        batch_size, grid_cells_z, grid_cells_x, grid_cells_y,
    )


@functools.partial(jax.jit, static_argnames=("batch_size", "grid_cells_z", "grid_cells_x", "grid_cells_y"))
def _bev_pool_fwd_impl(
    image_feats, geom_feats, interval_starts, interval_lengths,
    batch_size, grid_cells_z, grid_cells_x, grid_cells_y,
):
    num_points = image_feats.shape[0]
    num_intervals = interval_starts.shape[0]

    seg, within = _point_interval_ids(interval_starts, interval_lengths, num_points)
    masked = jnp.where(within[:, None], image_feats, 0)
    sums = jax.ops.segment_sum(masked, seg, num_segments=num_intervals)  # (n_int, C)

    first = geom_feats[interval_starts.astype(jnp.int32)]  # (n_int, 4): x, y, z, b
    out = jnp.zeros(
        (batch_size, grid_cells_z, grid_cells_x, grid_cells_y, image_feats.shape[1]),
        dtype=image_feats.dtype,
    )
    return out.at[first[:, 3], first[:, 2], first[:, 0], first[:, 1]].add(sums, mode="drop")


def _bev_pool_fwd(image_feats, geom_feats, interval_starts, interval_lengths, b, z, x, y):
    out = _bev_pool_fwd_impl(image_feats, geom_feats, interval_starts, interval_lengths, b, z, x, y)
    return out, (geom_feats, image_feats.shape[0])


def _bev_pool_bwd(interval_starts, interval_lengths, b, z, x, y, residuals, grad_output):
    geom_feats, num_points = residuals
    grad_points = bev_pool_backward(grad_output, geom_feats, interval_starts, interval_lengths, num_points)
    return grad_points, None


@functools.partial(jax.jit, static_argnames=("num_points",))
def bev_pool_backward(
    grad_output: jax.Array,
    geom_feats: jax.Array,
    interval_starts: jax.Array,
    interval_lengths: jax.Array,
    num_points: int,
) -> jax.Array:
    """Gradient wrt image features: broadcast each cell's grad to its points."""
    seg, within = _point_interval_ids(interval_starts, interval_lengths, num_points)
    first = geom_feats[interval_starts.astype(jnp.int32)]
    per_interval = grad_output[first[:, 3], first[:, 2], first[:, 0], first[:, 1]]  # (n_int, C)
    grads = per_interval[seg]
    return jnp.where(within[:, None], grads, 0)


bev_pool.defvjp(_bev_pool_fwd, _bev_pool_bwd)
