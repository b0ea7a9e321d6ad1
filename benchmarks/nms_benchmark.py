# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""NMS microbenchmark (parity: reference ``benchmarks/nms_benchmark.py``)."""

import jax.numpy as jnp
import numpy as np

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.kernels.vision.nms import _nms_keep_mask
from conch_tpu.ops.vision import nms


def main() -> None:
    parser = make_parser("NMS benchmark")
    parser.add_argument("--num-boxes", type=int, default=4096)
    parser.add_argument("--iou-threshold", type=float, default=0.5)
    parser.add_argument(
        "--with-host-gather", action="store_true",
        help="time the full op incl. the host-side kept-index gather "
        "(device->host pull; dominated by link latency on tunneled devices)",
    )
    args = parser.parse_args()

    r = rng(args)
    centers = r.uniform(0, 1000, size=(args.num_boxes, 2))
    sizes = r.uniform(5, 50, size=(args.num_boxes, 2))
    boxes = jnp.asarray(np.concatenate([centers - sizes / 2, centers + sizes / 2], 1), dtype=jnp.float32)
    scores = jnp.asarray(r.uniform(0, 1, args.num_boxes), dtype=jnp.float32)

    if args.with_host_gather:
        case = (f"nms_n{args.num_boxes}_host", lambda: nms(boxes, scores, args.iou_threshold))
    else:
        # Device-side sort + suppression kernel only: the final
        # data-dependent index gather is a tiny host pull whose cost is
        # pure link latency, not op cost. Compute-bound (no GB/s column).
        case = (
            f"nms_n{args.num_boxes}",
            lambda carry, boxes, scores: _nms_keep_mask(boxes, scores + carry, args.iou_threshold),
            None, (boxes, scores),
        )
    run_and_report(args, [case])


if __name__ == "__main__":
    main()
