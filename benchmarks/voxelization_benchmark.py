# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Voxelization microbenchmark (parity: reference ``benchmarks/voxelization_benchmark.py``)."""

import jax.numpy as jnp
import numpy as np

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.vision import VoxelizationParameter, generate_voxels


def main() -> None:
    parser = make_parser("Voxelization benchmark")
    parser.add_argument("--num-points", type=int, default=200000)
    parser.add_argument("--max-points-per-voxel", type=int, default=32)
    args = parser.parse_args()

    r = rng(args)
    param = VoxelizationParameter(
        min_range=(0.0, -40.0, -3.0), max_range=(70.0, 40.0, 1.0),
        voxel_dim=(0.5, 0.5, 4.0), max_num_points_per_voxel=args.max_points_per_voxel,
    )
    pts = np.concatenate(
        [r.uniform(0, 70, (args.num_points, 1)), r.uniform(-40, 40, (args.num_points, 1)),
         r.uniform(-3, 1, (args.num_points, 1)), r.normal(size=(args.num_points, 1))], axis=1
    ).astype(np.float32)
    pts_j = jnp.asarray(pts)

    run_and_report(args, [(
        f"voxelization_n{args.num_points}",
        # Sort-bound, not bandwidth-bound: honest loop timing, no GB/s.
        lambda carry, pts: generate_voxels(pts + carry, param)[1],
        None, (pts_j,),
    )])


if __name__ == "__main__":
    main()
