# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Non-maximum suppression.

TPU-native re-design of the reference Triton kernels
(``conch/kernels/vision/nms.py:93-204``). Stage 1 (the O(N^2) IoU>threshold
mask) is a fully vectorized broadcast that XLA fuses onto the VPU - the
reference's per-row program with blocked column loops adds nothing on TPU.
Stage 2 is the inherently sequential greedy suppression, expressed as a
``lax.fori_loop`` over boxes in score order; where the reference needs
``tl.debug_barrier()`` for store visibility (``:199-204``), the functional
loop-carried keep-mask makes the dependency explicit and race-free.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def _iou_exceeds_mask(boxes: jax.Array, iou_threshold: float) -> jax.Array:
    """(N, N) boolean mask of IoU > threshold (computed densely)."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)

    inter_x1 = jnp.maximum(x1[:, None], x1[None, :])
    inter_y1 = jnp.maximum(y1[:, None], y1[None, :])
    inter_x2 = jnp.minimum(x2[:, None], x2[None, :])
    inter_y2 = jnp.minimum(y2[:, None], y2[None, :])

    inter = jnp.maximum(0.0, inter_x2 - inter_x1) * jnp.maximum(0.0, inter_y2 - inter_y1)
    union = area[:, None] + area[None, :] - inter
    iou = jnp.where(union > 0.0, inter / union, 0.0)
    return iou > iou_threshold


@jax.jit
def _suppress(exceeds: jax.Array) -> jax.Array:
    """Greedy sequential suppression over boxes in (sorted) order."""
    num_boxes = exceeds.shape[0]
    later = jnp.arange(num_boxes)

    def body(i, keep):
        # If box i is kept, suppress every later box whose IoU with i
        # exceeds the threshold.
        suppress_row = exceeds[i] & (later > i) & keep[i]
        return keep & ~suppress_row

    return jax.lax.fori_loop(0, num_boxes - 1, body, jnp.ones((num_boxes,), dtype=bool))


def nms_launcher(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> jax.Array:
    """Run NMS; returns kept indices sorted by decreasing score.

    Args:
        boxes: (N, 4) in (x1, y1, x2, y2) format.
        scores: (N,).
        iou_threshold: suppression threshold.
    """
    order = jnp.argsort(-scores)  # descending score
    sorted_boxes = boxes[order]
    exceeds = _iou_exceeds_mask(sorted_boxes, iou_threshold)
    keep = _suppress(exceeds)
    return order[keep]
