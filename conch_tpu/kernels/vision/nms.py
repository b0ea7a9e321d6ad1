# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Non-maximum suppression.

TPU-native re-design of the reference Triton kernels
(``conch/kernels/vision/nms.py:93-204``). The reference is two-stage:
an O(N^2) IoU>threshold mask kernel, then a single sequential program
that walks rows with ``tl.debug_barrier()`` for store visibility
(``:171-204``). On TPU both stages collapse into ONE Pallas program:

- The greedy pass runs as an in-kernel ``fori_loop`` with boxes and the
  keep-mask resident in VMEM — per-iteration cost is a handful of VPU
  ops, not an XLA dispatch + HBM row fetch.
- IoU is computed on the fly against all N boxes each iteration, so the
  O(N^2) mask is never materialized: no 16 MB scratch, no second kernel,
  and the loop body is race-free by construction (the keep-mask is a
  loop carry).
- All per-box vectors live in a **dense (N/128, 128) layout** (score
  order is row-major over it): every elementwise op runs on packed
  vregs and the scalar extractions are dense reductions. A flat (1, N)
  layout runs ~8x slower — one sublane used per vreg and long
  cross-vreg reduction chains.
- Scalars of the current pivot box are extracted with one-hot
  reductions (dense VPU ops) instead of dynamic lane slicing, which
  Mosaic lowers poorly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import round_up, use_interpret_mode

_LANES = 128


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, area_ref, out_ref, *, num_boxes: int, iou_threshold: float):
    """All refs (R, 128) f32, boxes in score order laid out row-major."""
    x1, y1, x2, y2, area = x1_ref[...], y1_ref[...], x2_ref[...], y2_ref[...], area_ref[...]
    rows = x1.shape[0]
    flat = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    )

    def body(i, keep):
        # All pivot quantities stay (1, 1)-shaped VECTOR values: a scalar
        # extraction (vector->sreg move) costs hundreds of cycles on TPU,
        # while a keepdims reduce + splat-broadcast is a short chain of
        # vector ops.
        onehot = (flat == i).astype(jnp.float32)
        xi1 = jnp.sum(onehot * x1, keepdims=True)
        yi1 = jnp.sum(onehot * y1, keepdims=True)
        xi2 = jnp.sum(onehot * x2, keepdims=True)
        yi2 = jnp.sum(onehot * y2, keepdims=True)
        ai = jnp.sum(onehot * area, keepdims=True)
        keep_i = jnp.sum(onehot * keep, keepdims=True)

        inter_w = jnp.maximum(0.0, jnp.minimum(x2, xi2) - jnp.maximum(x1, xi1))
        inter_h = jnp.maximum(0.0, jnp.minimum(y2, yi2) - jnp.maximum(y1, yi1))
        inter = inter_w * inter_h
        union = area + ai - inter
        iou = jnp.where(union > 0.0, inter / union, 0.0)

        suppress = (iou > iou_threshold) & (flat > i) & (keep_i > 0.0)
        return keep * (1.0 - suppress.astype(jnp.float32))

    keep0 = (flat < num_boxes).astype(jnp.float32)
    out_ref[...] = jax.lax.fori_loop(0, num_boxes - 1, body, keep0)


@functools.partial(jax.jit, static_argnames=("iou_threshold",))
def _nms_keep_mask(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> tuple[jax.Array, jax.Array]:
    """Returns (order, keep-mask over order) — the jittable part of NMS."""
    num_boxes = boxes.shape[0]
    order = jnp.argsort(-scores)  # descending score
    sb = boxes[order].astype(jnp.float32)

    n_pad = round_up(num_boxes, 8 * _LANES)
    rows = n_pad // _LANES

    def to_grid(v: jax.Array) -> jax.Array:
        return jnp.pad(v, (0, n_pad - num_boxes)).reshape(rows, _LANES)

    x1, y1, x2, y2 = sb[:, 0], sb[:, 1], sb[:, 2], sb[:, 3]
    area = (x2 - x1) * (y2 - y1)

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, num_boxes=num_boxes, iou_threshold=iou_threshold),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret_mode(),
    )(to_grid(x1), to_grid(y1), to_grid(x2), to_grid(y2), to_grid(area))

    return order, keep.reshape(-1)[:num_boxes] > 0.0


def nms_launcher(boxes: jax.Array, scores: jax.Array, iou_threshold: float) -> jax.Array:
    """Run NMS; returns kept indices sorted by decreasing score.

    The kept-index gather is data-dependently sized, so it happens outside
    jit; the sort + suppression kernel is one jitted computation.

    Args:
        boxes: (N, 4) in (x1, y1, x2, y2) format.
        scores: (N,).
        iou_threshold: suppression threshold.
    """
    order, keep = _nms_keep_mask(boxes, scores, iou_threshold)
    return order[keep]
