# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

from conch_tpu.ops.vision.bev_pool import bev_pool, bev_pool_backward
from conch_tpu.ops.vision.nms import nms
from conch_tpu.ops.vision.voxelization import VoxelizationParameter, generate_voxels

__all__ = ["VoxelizationParameter", "bev_pool", "bev_pool_backward", "generate_voxels", "nms"]
