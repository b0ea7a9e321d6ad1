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
