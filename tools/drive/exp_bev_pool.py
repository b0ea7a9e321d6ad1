# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Experiment: where does bev_pool's 8.7 ms go on TPU, and what's faster?

Variants timed at the benchmark shape (16384 intervals, mean 4 points,
C=80, 128x128 grid):

- current        : shipped segment_sum + scatter-add impl
- segsum_only    : segment_sum without the grid scatter
- scatter_only   : grid scatter-add of precomputed sums
- scatter_set    : grid scatter with .set (intervals own unique cells)
- cumsum_diff    : cumsum + boundary gather difference + scatter-set
- dense_lmax     : gather starts+l for l<Lmax, mask, sum + scatter-set
- onehot_grid    : segment sums via dense_lmax; grid placement via
                   one-hot matmul (MXU instead of scatter)
"""

from __future__ import annotations

import functools
import sys
import pathlib
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.kernels.vision.bev_pool import bev_pool as current_bev_pool

NI, MEAN, C, G = 16384, 4, 80, 128


def make_inputs(seed=0):
    r = np.random.default_rng(seed)
    lengths = r.integers(1, 2 * MEAN, size=NI).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
    n = int(lengths.sum())
    feats = r.normal(size=(n, C)).astype(np.float32)
    geom = np.zeros((n, 4), np.int32)
    cells = np.sort(r.choice(G * G, size=NI, replace=False))
    for i, (s, ln) in enumerate(zip(starts, lengths)):
        geom[s : s + ln] = (cells[i] // G, cells[i] % G, 0, 0)
    return (jnp.asarray(feats), jnp.asarray(geom), jnp.asarray(starts),
            jnp.asarray(lengths), jnp.asarray(cells.astype(np.int32)), n)


def timeit(tag, fn, *args, iters=20):
    """Time fn via host-readback differencing (block_until_ready lies on axon).

    Runs ``iters`` dependent applications under one jit (scan-carried fold so
    nothing is dead), reads the result back, and differences two iteration
    counts to cancel dispatch/tunnel constants.
    """

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(n, f, *rest):
        def body(f, _):
            out = fn(f, *rest)
            # fold the output back into the float input so the body is
            # loop-carried (XLA cannot hoist/CSE it out of the scan)
            f = f.at[0, : min(8, f.shape[1])].add(
                out.ravel()[:8].astype(f.dtype) * 1e-6
            )
            return f, ()

        f, _ = jax.lax.scan(body, f, None, length=n)
        return f[0, :8]

    _ = np.asarray(run(2, *args))
    _ = np.asarray(run(2 + iters, *args))
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter()
        _ = np.asarray(run(2, *args))
        t1 = time.perf_counter()
        _ = np.asarray(run(2 + iters, *args))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    ms = min(diffs) / iters * 1e3
    print(f"{tag:16s} {ms:8.4f} ms", flush=True)
    return fn(*args)


def main():
    feats, geom, starts, lengths, cells, n = make_inputs()

    from conch_tpu.kernels.vision.bev_pool import bev_pool_backward

    out = timeit(
        "pallas_fwd",
        lambda f: current_bev_pool(f, geom, starts, lengths, 1, 1, G, G, True),
        feats,
    )
    timeit(
        "xla_fwd",
        lambda f: current_bev_pool(f, geom, starts, lengths, 1, 1, G, G, False),
        feats,
    )
    timeit(
        "pallas_bwd",
        lambda g: bev_pool_backward(
            g.reshape(1, 1, G, G, feats.shape[1]), geom, starts, lengths, n, True
        ),
        jnp.asarray(out).reshape(G * G, feats.shape[1]),
    )
    timeit(
        "xla_bwd",
        lambda g: bev_pool_backward(
            g.reshape(1, 1, G, G, feats.shape[1]), geom, starts, lengths, n, False
        ),
        jnp.asarray(out).reshape(G * G, feats.shape[1]),
    )

    # numeric sanity: pallas vs xla fallback
    a = np.asarray(current_bev_pool(feats, geom, starts, lengths, 1, 1, G, G, True))
    b = np.asarray(current_bev_pool(feats, geom, starts, lengths, 1, 1, G, G, False))
    print("fwd pallas-vs-xla max err:", float(np.abs(a - b).max()))


if __name__ == "__main__":
    main()
