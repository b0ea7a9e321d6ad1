# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""BEVPool microbenchmark (parity: reference ``benchmarks/bev_pool_benchmark.py``
and ``bev_pool_backward_benchmark.py``)."""

import jax.numpy as jnp
import numpy as np

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.vision import bev_pool, bev_pool_backward


def main() -> None:
    parser = make_parser("BEVPool benchmark")
    parser.add_argument("--num-intervals", type=int, default=16384)
    parser.add_argument("--mean-points", type=int, default=4)
    parser.add_argument("--channels", type=int, default=80)
    parser.add_argument("--grid", type=int, default=128)
    args = parser.parse_args()

    r = rng(args)
    lengths = r.integers(1, 2 * args.mean_points, size=args.num_intervals).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
    n = int(lengths.sum())
    L = 2  # rotated buffer stack: no VMEM residency across loop iterations
    feats = jnp.asarray(r.normal(size=(L, n, args.channels)), dtype=jnp.float32)
    geom = np.zeros((n, 4), np.int32)
    # BEVFusion quick-cumsum constructs intervals from points sorted by
    # cell rank -> ascending interval cells (the cells_sorted=True contract).
    cells = np.sort(r.choice(args.grid * args.grid, size=args.num_intervals, replace=False))
    for i, (s, ln) in enumerate(zip(starts, lengths)):
        geom[s : s + ln] = (cells[i] // args.grid, cells[i] % args.grid, 0, 0)
    geom_j = jnp.asarray(geom)
    starts_j = jnp.asarray(starts)
    lengths_j = jnp.asarray(lengths)

    out = bev_pool(feats[0], geom_j, starts_j, lengths_j, 1, 1, args.grid, args.grid)
    grads = jnp.stack([out, out * 1.125])

    out_nbytes = args.grid * args.grid * args.channels * 4
    per_feats = feats.nbytes // L
    # geom/starts/lengths stay closure constants: bev_pool's custom_vjp
    # marks them nondiff, so they must be concrete (and they are small).
    run_and_report(args, [
        ("bev_pool_fwd",
         lambda carry, f: bev_pool(
             f, geom_j, starts_j, lengths_j, 1, 1, args.grid, args.grid),
         per_feats + out_nbytes, (), None, (feats,)),
        ("bev_pool_bwd",
         lambda carry, g: bev_pool_backward(g, geom_j, starts_j, lengths_j),
         per_feats + out_nbytes, (), None, (grads,)),
    ])


if __name__ == "__main__":
    main()
