# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""NMS public op (parity: ``conch/ops/vision/nms.py:11-52``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from conch_tpu.kernels.vision.nms import nms_launcher


def nms(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> jax.Array:
    """Greedy IoU-based non-maximum suppression.

    Args:
        boxes: (N, 4) boxes in (x1, y1, x2, y2) format.
        scores: (N,) box scores.
        iou_threshold: boxes with IoU above this vs a kept higher-scoring
            box are suppressed.

    Returns:
        Indices of kept boxes, sorted by decreasing score.
    """
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=jnp.int32)
    return nms_launcher(boxes, scores, iou_threshold)
