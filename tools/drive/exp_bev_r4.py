# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Round-4 bev_pool window-geometry sweep.

The r3 kernels measure 105 GB/s effective (0.248 ms fwd) on the benchmark
shape — but the kernel is MXU mask-contraction bound, not HBM bound, and
the mask MAC count scales LINEARLY with the interval-block size:

    K1 MACs ~= steps * (BI * window_pts * Cpad * 3)
             = NI * (mean_len * BI rounded up to WP chunks) * Cpad * 3

so halving _BI halves the MXU work as long as the per-step point window
(~BI * mean_len) still fills a WP chunk. This sweeps (BI, WP) for the
interval-sums kernel and (BC, WI) for the placement kernel on the
benchmark shape (NI=16384, mean 4 pts, C=80, 128x128 grid), fwd and bwd,
with the robust differenced timer.
"""

from __future__ import annotations

import functools
import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.kernels.vision import bev_pool as bp
from conch_tpu.utils.benchmark import robust_diff_time

import argparse

_p = argparse.ArgumentParser()
_p.add_argument("--ni", type=int, default=16384)
_p.add_argument("--channels", type=int, default=80)
_p.add_argument("--grid", type=int, default=128)
_p.add_argument("--iters", type=int, default=32)
_a = _p.parse_args()
NI, MEAN_PTS, C, GRID = _a.ni, 4, _a.channels, _a.grid
L = 2
ITERS = _a.iters


def clear_caches():
    for f in (bp._bev_pool_sorted_impl, bp._bev_pool_backward_sorted_impl):
        try:
            f.clear_cache()
        except AttributeError:
            pass


def bench(tag, fn, args, bytes_per, iters=ITERS):
    @functools.partial(jax.jit, static_argnames=("n",))
    def run(ops, n):
        def outer(c, _):
            def body(c, x):
                r = fn(x, *args[1:])
                return c + r.reshape(-1)[:1].astype(jnp.float32) * 1e-9, ()
            c, _ = jax.lax.scan(body, c, ops)
            return c, ()
        c, _ = jax.lax.scan(outer, jnp.zeros((1,), jnp.float32), None, length=n)
        return c

    xs = args[0]
    _ = np.asarray(run(xs, n=1)); _ = np.asarray(run(xs, n=1 + iters // L))
    per, ok = robust_diff_time(
        lambda: np.asarray(run(xs, n=1)),
        lambda: np.asarray(run(xs, n=1 + iters // L)),
        (iters // L) * L,
    )
    flag = "" if ok else "  [unstable]"
    print(f"{tag:32s} {per*1e3:8.4f} ms  {bytes_per/per/1e9:7.1f} GB/s{flag}", flush=True)


def main():
    r = np.random.default_rng(0)
    lengths = r.integers(1, 2 * MEAN_PTS, size=NI).astype(np.int32)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
    n = int(lengths.sum())
    feats = jnp.asarray(r.normal(size=(L, n, C)), jnp.float32)
    geom = np.zeros((n, 4), np.int32)
    cells = np.sort(r.choice(GRID * GRID, size=NI, replace=False))
    for i, (s, ln) in enumerate(zip(starts, lengths)):
        geom[s : s + ln] = (cells[i] // GRID, cells[i] % GRID, 0, 0)
    geom_j = jnp.asarray(geom)
    starts_j = jnp.asarray(starts)
    lengths_j = jnp.asarray(lengths)

    out = bp.bev_pool(feats[0], geom_j, starts_j, lengths_j, 1, 1, GRID, GRID)
    ref = np.asarray(out)
    grads = jnp.stack([out, out * 1.125])

    out_nbytes = GRID * GRID * C * 4
    fwd_bytes = feats.nbytes // L + out_nbytes

    def fwd(f, *a):
        return bp.bev_pool(f, geom_j, starts_j, lengths_j, 1, 1, GRID, GRID)

    def bwd(g, *a):
        return bp.bev_pool_backward(g, geom_j, starts_j, lengths_j, n)

    for bi, wp, bc, wi in [
        (256, 512, 256, 256),  # shipped r3 defaults
        (128, 512, 256, 256),
        (128, 256, 256, 256),
        (64, 256, 256, 256),
        (64, 128, 256, 256),
        (128, 512, 128, 128),
        (64, 256, 128, 128),
        (64, 256, 64, 128),
        (32, 128, 64, 128),
    ]:
        bp._BI, bp._WP, bp._BC, bp._WI = bi, wp, bc, wi
        clear_caches()
        got = np.asarray(bp.bev_pool(feats[0], geom_j, starts_j, lengths_j, 1, 1, GRID, GRID))
        if not np.allclose(got, ref, rtol=1e-5, atol=1e-5):
            print(f"bi{bi}_wp{wp}_bc{bc}_wi{wi}  WRONG RESULT", flush=True)
            continue
        try:
            bench(f"fwd_bi{bi}_wp{wp}_bc{bc}_wi{wi}", fwd, (feats,), fwd_bytes)
            bench(f"bwd_bi{bi}_wp{wp}_bc{bc}_wi{wi}", bwd, (grads,), fwd_bytes, iters=16)
        except Exception as e:  # noqa: BLE001
            print(f"bi{bi}_wp{wp} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
