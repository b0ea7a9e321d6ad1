# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Point-cloud voxelization: sort-based, deterministic.

TPU-native re-design of the reference's atomic-scatter voxelization
(``conch/kernels/vision/voxelization.py:12-151``). The reference scatters
points into a dense grid with ``tl.atomic_add`` slot counters and compacts
non-empty voxels with an atomic counter — producing *non-deterministic*
voxel and point ordering (documented in its op,
``ops/vision/voxelization.py:51``). Pallas TPU has no global atomics, and
determinism is a feature: we use the reference's own "stable" testing
algorithm (``reference/vision/voxelization.py:108-178``) as the primary
implementation — label points with their flat voxel key, stable-sort by
key, run-length encode — fully vectorized, same outputs every run, voxels
emitted in ascending flat-key order.

Key layout parity: ``flat = (vz * grid_y + vy) * grid_x + vx``;
``voxel_indices`` rows are (x, y, z, 0); per-voxel point counts are capped
at ``max_num_points_per_voxel``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(
    jax.jit,
    static_argnames=(
        "min_range", "max_range", "voxel_dim", "grid_dim", "max_num_points_per_voxel", "max_num_voxels"
    ),
)
def generate_voxels_launcher(
    points: jax.Array,
    *,
    min_range: tuple[float, float, float],
    max_range: tuple[float, float, float],
    voxel_dim: tuple[float, float, float],
    grid_dim: tuple[int, int, int],
    max_num_points_per_voxel: int,
    max_num_voxels: int,
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Deterministic voxelization of (num_points, 4) x/y/z/w points.

    Returns:
        (num_filled_voxels scalar, point_features (max_voxels, max_pts, 4),
         voxel_indices (max_voxels, 4), num_points_per_voxel (max_voxels,)).
        Rows past num_filled are zero.
    """
    num_points = points.shape[0]
    gx, gy, gz = grid_dim

    vx = jnp.floor((points[:, 0] - min_range[0]) / voxel_dim[0]).astype(jnp.int32)
    vy = jnp.floor((points[:, 1] - min_range[1]) / voxel_dim[1]).astype(jnp.int32)
    vz = jnp.floor((points[:, 2] - min_range[2]) / voxel_dim[2]).astype(jnp.int32)

    valid = (
        (vx >= 0) & (vx < gx) & (vy >= 0) & (vy < gy) & (vz >= 0) & (vz < gz)
    )
    flat = (vz * gy + vy) * gx + vx
    # Invalid points sort to the end.
    sort_key = jnp.where(valid, flat, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(sort_key, stable=True)
    sorted_key = sort_key[order]
    sorted_valid = valid[order]
    sorted_points = points[order]

    # Run-length encode consecutive equal keys among valid points.
    is_new = sorted_valid & jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    voxel_rank = jnp.cumsum(is_new) - 1  # id of each point's voxel
    num_filled = jnp.sum(is_new).astype(jnp.int32)

    # Position of each point within its voxel: index - start-of-run.
    idx = jnp.arange(num_points, dtype=jnp.int32)
    run_start = jax.lax.cummax(jnp.where(is_new, idx, 0))
    pos_in_voxel = idx - run_start

    # Scatter point features: (voxel_rank, pos) <- sorted point, capped.
    write = sorted_valid & (pos_in_voxel < max_num_points_per_voxel)
    rank_w = jnp.where(write, voxel_rank, max_num_voxels)  # OOB -> dropped
    point_features = jnp.zeros((max_num_voxels, max_num_points_per_voxel, 4), dtype=points.dtype)
    point_features = point_features.at[rank_w, pos_in_voxel].set(sorted_points, mode="drop")

    # Per-voxel counts (capped) and 3D indices from the flat key.
    counts_raw = jax.ops.segment_sum(
        sorted_valid.astype(jnp.int32), jnp.where(sorted_valid, voxel_rank, max_num_voxels),
        num_segments=max_num_voxels + 1,
    )[:max_num_voxels]
    num_points_per_voxel = jnp.minimum(counts_raw, max_num_points_per_voxel)

    first_key = jnp.zeros((max_num_voxels,), dtype=jnp.int32).at[rank_w].set(
        sorted_key, mode="drop"
    )
    out_x = first_key % gx
    out_y = (first_key // gx) % gy
    out_z = first_key // (gx * gy)
    voxel_ids = jnp.arange(max_num_voxels, dtype=jnp.int32)
    filled_mask = voxel_ids < num_filled
    voxel_indices = jnp.stack(
        [
            jnp.where(filled_mask, out_x, 0),
            jnp.where(filled_mask, out_y, 0),
            jnp.where(filled_mask, out_z, 0),
            jnp.zeros((max_num_voxels,), dtype=jnp.int32),
        ],
        axis=1,
    )

    return num_filled, point_features, voxel_indices, num_points_per_voxel
