# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Golden numpy references for the vision ops.

Mirrors the reference's PyTorch reference implementations
(``conch/reference/vision/*``): straightforward loop/vectorized numpy
used to cross-check the TPU implementations.
"""

from __future__ import annotations

import numpy as np


def bev_pool(
    image_feats: np.ndarray,
    geom_feats: np.ndarray,
    interval_starts: np.ndarray,
    interval_lengths: np.ndarray,
    batch_size: int,
    grid_z: int,
    grid_x: int,
    grid_y: int,
) -> np.ndarray:
    """Loop-based golden BEVPool forward."""
    channels = image_feats.shape[1]
    out = np.zeros((batch_size, grid_z, grid_x, grid_y, channels), dtype=image_feats.dtype)
    for start, length in zip(interval_starts, interval_lengths):
        total = image_feats[start : start + length].sum(axis=0)
        x, y, z, b = geom_feats[start]
        out[b, z, x, y] += total
    return out


def bev_pool_backward(
    grad_output: np.ndarray,
    geom_feats: np.ndarray,
    interval_starts: np.ndarray,
    interval_lengths: np.ndarray,
    num_points: int,
) -> np.ndarray:
    """Loop-based golden BEVPool backward."""
    channels = grad_output.shape[-1]
    grads = np.zeros((num_points, channels), dtype=grad_output.dtype)
    for start, length in zip(interval_starts, interval_lengths):
        x, y, z, b = geom_feats[start]
        grads[start : start + length] = grad_output[b, z, x, y]
    return grads


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> np.ndarray:
    """Greedy NMS golden reference (torchvision semantics)."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    for idx in order:
        if suppressed[idx]:
            continue
        keep.append(idx)
        x1 = np.maximum(boxes[idx, 0], boxes[:, 0])
        y1 = np.maximum(boxes[idx, 1], boxes[:, 1])
        x2 = np.minimum(boxes[idx, 2], boxes[:, 2])
        y2 = np.minimum(boxes[idx, 3], boxes[:, 3])
        inter = np.maximum(0.0, x2 - x1) * np.maximum(0.0, y2 - y1)
        union = areas[idx] + areas - inter
        iou = np.where(union > 0, inter / union, 0.0)
        suppressed |= iou > iou_threshold
    return np.asarray(keep, dtype=np.int64)


def voxelize(
    points: np.ndarray,
    min_range,
    voxel_dim,
    grid_dim,
    max_points_per_voxel: int,
):
    """Dict-based golden voxelization: voxel key -> list of point rows."""
    gx, gy, gz = grid_dim
    voxels: dict[int, list[int]] = {}
    for i, p in enumerate(points):
        vx = int(np.floor((p[0] - min_range[0]) / voxel_dim[0]))
        vy = int(np.floor((p[1] - min_range[1]) / voxel_dim[1]))
        vz = int(np.floor((p[2] - min_range[2]) / voxel_dim[2]))
        if 0 <= vx < gx and 0 <= vy < gy and 0 <= vz < gz:
            key = (vz * gy + vy) * gx + vx
            voxels.setdefault(key, []).append(i)
    return voxels
