# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""BEVPool public ops (parity: ``conch/ops/vision/bev_pool.py:11-86``)."""

from __future__ import annotations

import jax

from conch_tpu.kernels.vision.bev_pool import bev_pool as _bev_pool_vjp
from conch_tpu.kernels.vision.bev_pool import bev_pool_backward as _bev_pool_backward


def bev_pool(
    image_feats: jax.Array,
    geom_feats: jax.Array,
    interval_starts: jax.Array,
    interval_lengths: jax.Array,
    batch_size: int,
    grid_cells_z: int,
    grid_cells_x: int,
    grid_cells_y: int,
    cells_sorted: bool = True,
) -> jax.Array:
    """Cumulative-sum pooling onto a 3D voxel grid (differentiable).

    Args:
        image_feats: input image features (num_points, channels).
        geom_feats: input coordinates (num_points, 4) as (x, y, z, batch).
        interval_starts: first point index of each pooled interval.
        interval_lengths: number of points in each pooled interval.
        batch_size / grid_cells_z / grid_cells_x / grid_cells_y: grid dims.
        cells_sorted: intervals arrive in ascending flattened-cell order
            (guaranteed by the BEVFusion quick-cumsum construction, which
            sorts points by cell rank before deriving intervals). Selects
            the windowed Pallas kernels; pass False for arbitrary order.

    Returns:
        (batch_size, grid_z, grid_x, grid_y, channels) pooled features;
        differentiable wrt ``image_feats`` (custom VJP).
    """
    return _bev_pool_vjp(
        image_feats,
        geom_feats,
        interval_starts,
        interval_lengths,
        batch_size,
        grid_cells_z,
        grid_cells_x,
        grid_cells_y,
        cells_sorted,
    )


def bev_pool_backward(
    grad_output: jax.Array,
    geom_feats: jax.Array,
    interval_starts: jax.Array,
    interval_lengths: jax.Array,
    cells_sorted: bool = True,
) -> jax.Array:
    """Explicit backward pass (parity with the reference's separate op)."""
    num_points = geom_feats.shape[0]
    return _bev_pool_backward(
        grad_output, geom_feats, interval_starts, interval_lengths, num_points,
        cells_sorted=cells_sorted,
    )
