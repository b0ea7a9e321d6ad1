# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Voxelization public op (parity: ``conch/ops/vision/voxelization.py:14-130``).

Unlike the reference (atomic scatter, randomly-ordered output,
``ops/vision/voxelization.py:51``), this implementation is deterministic:
voxels are emitted in ascending flat-key order and points keep their
input order within each voxel.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from conch_tpu.kernels.vision.voxelization import generate_voxels_launcher


@dataclass
class VoxelizationParameter:
    """Voxel grid parameters (parity: reference ``voxelization.py:14-45``)."""

    min_range: tuple[float, float, float]
    max_range: tuple[float, float, float]
    voxel_dim: tuple[float, float, float]
    grid_dim: tuple[int, int, int]
    max_num_points_per_voxel: int
    max_num_voxels: int

    def __init__(
        self,
        min_range: tuple[float, float, float],
        max_range: tuple[float, float, float],
        voxel_dim: tuple[float, float, float],
        max_num_points_per_voxel: int,
    ) -> None:
        self.min_range = tuple(min_range)
        self.max_range = tuple(max_range)
        self.voxel_dim = tuple(voxel_dim)
        self.max_num_points_per_voxel = max_num_points_per_voxel
        self.grid_dim = self._compute_grid_dim()
        self.max_num_voxels = self.grid_dim[0] * self.grid_dim[1] * self.grid_dim[2]

    def _compute_grid_dim(self) -> tuple[int, int, int]:
        grid_x = round((self.max_range[0] - self.min_range[0]) / self.voxel_dim[0])
        grid_y = round((self.max_range[1] - self.min_range[1]) / self.voxel_dim[1])
        grid_z = round((self.max_range[2] - self.min_range[2]) / self.voxel_dim[2])
        return (grid_x, grid_y, grid_z)


def generate_voxels(
    points: jax.Array, param: VoxelizationParameter
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Voxelize a point cloud.

    Args:
        points: (num_points, 4) with fields x, y, z, <extra>.
        param: voxelization parameters.

    Returns:
        (num_filled_voxels scalar,
         point_features (max_num_voxels, max_pts_per_voxel, 4),
         voxel_indices (max_num_voxels, 4) as (x, y, z, 0),
         num_points_per_voxel (max_num_voxels,) capped counts).
        Rows past num_filled_voxels are zero.
    """
    assert points.shape[1] == 4
    return generate_voxels_launcher(
        points,
        min_range=param.min_range,
        max_range=param.max_range,
        voxel_dim=param.voxel_dim,
        grid_dim=param.grid_dim,
        max_num_points_per_voxel=param.max_num_points_per_voxel,
        max_num_voxels=param.max_num_voxels,
    )


def voxelization_stable(
    points: jax.Array, param: VoxelizationParameter
) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Deterministic voxelization SoA (parity: reference
    ``reference/vision/voxelization.py:108-178`` ``voxelization_stable``).

    Labels each point with its flat voxel key, stable-sorts by key, and
    run-length encodes — same algorithm as the reference's deterministic
    variant, fully vectorized. Where the reference returns dynamically-sized
    tensors, this returns max-padded arrays plus a filled count (JAX static
    shapes).

    Args:
        points: (num_points, num_features) with x, y, z leading.
        param: voxelization parameters.

    Returns:
        (num_points_per_voxel (max_num_voxels,) int32 — UNCAPPED counts,
         point_indices (num_points,) int32 — original point indices grouped
           by voxel, contiguous segments in ascending flat-key order; slots
           past the total valid-point count hold ``num_points`` (a sentinel),
         flat_voxel_indices (max_num_voxels,) int32 — ascending flat keys,
         num_filled_voxels scalar int32).
        Rows past num_filled_voxels are zero.
    """
    num_points = points.shape[0]
    gx, gy, gz = param.grid_dim
    max_num_voxels = param.max_num_voxels

    vx = jnp.floor((points[:, 0] - param.min_range[0]) / param.voxel_dim[0]).astype(jnp.int32)
    vy = jnp.floor((points[:, 1] - param.min_range[1]) / param.voxel_dim[1]).astype(jnp.int32)
    vz = jnp.floor((points[:, 2] - param.min_range[2]) / param.voxel_dim[2]).astype(jnp.int32)
    valid = (vx >= 0) & (vx < gx) & (vy >= 0) & (vy < gy) & (vz >= 0) & (vz < gz)
    flat = (vz * gy + vy) * gx + vx
    sort_key = jnp.where(valid, flat, jnp.iinfo(jnp.int32).max)

    order = jnp.argsort(sort_key, stable=True).astype(jnp.int32)
    sorted_key = sort_key[order]
    sorted_valid = valid[order]
    point_indices = jnp.where(sorted_valid, order, num_points)

    is_new = sorted_valid & jnp.concatenate(
        [jnp.ones((1,), bool), sorted_key[1:] != sorted_key[:-1]]
    )
    voxel_rank = jnp.cumsum(is_new) - 1
    num_filled = jnp.sum(is_new).astype(jnp.int32)

    seg_id = jnp.where(sorted_valid, voxel_rank, max_num_voxels)
    num_points_per_voxel = jax.ops.segment_sum(
        sorted_valid.astype(jnp.int32), seg_id, num_segments=max_num_voxels + 1
    )[:max_num_voxels]
    flat_voxel_indices = (
        jnp.zeros((max_num_voxels,), jnp.int32).at[seg_id].set(sorted_key, mode="drop")
    )
    return num_points_per_voxel, point_indices, flat_voxel_indices, num_filled


def collect_point_features(
    points: jax.Array,
    num_points_per_voxel: jax.Array,
    point_indices: jax.Array,
    param: VoxelizationParameter,
) -> tuple[jax.Array, jax.Array]:
    """Gather per-voxel point features from a ``voxelization_stable`` result
    (parity: reference ``reference/vision/voxelization.py:263-334``).

    One vectorized (voxel, slot) gather instead of the reference's
    per-voxel serial loop.

    Args:
        points: (num_points, num_features) raw points.
        num_points_per_voxel: (max_num_voxels,) uncapped counts.
        point_indices: (num_points,) grouped original indices (sentinel-padded).
        param: voxelization parameters.

    Returns:
        (point_features (max_num_voxels, max_num_points_per_voxel,
         num_features) float32, zero-filled for empty slots;
         capped_num_points_per_voxel (max_num_voxels,) int32).
    """
    max_pts = param.max_num_points_per_voxel
    capped = jnp.minimum(num_points_per_voxel, max_pts)
    segment_start = jnp.cumsum(num_points_per_voxel) - num_points_per_voxel
    # (max_voxels, max_pts) source slots in the grouped index array.
    slot = segment_start[:, None] + jnp.arange(max_pts, dtype=jnp.int32)[None, :]
    in_voxel = jnp.arange(max_pts, dtype=jnp.int32)[None, :] < capped[:, None]
    src = jnp.where(in_voxel, jnp.clip(slot, 0, point_indices.shape[0] - 1), 0)
    raw_idx = jnp.clip(point_indices[src], 0, points.shape[0] - 1)
    feats = points[raw_idx].astype(jnp.float32)
    point_features = jnp.where(in_voxel[:, :, None], feats, 0.0)
    return point_features, capped
