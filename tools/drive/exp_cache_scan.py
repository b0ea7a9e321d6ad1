# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Does the layer scan's cache xs->ys roundtrip copy the whole KV pool?

The model threads (L, P, KH, ps, D) caches through lax.scan as xs and
returns updated slices as ys. If XLA does not alias xs->ys, every decode
step re-materializes the full cache (1.1 GB at Llama-8B b8 ctx1024),
which would explain the step-time floor. Timed patterns, same scatter:

- scan_xs_ys : current pattern (caches as scan xs, updated slices as ys)
- carry_dus  : caches as scan carry, at[l] dynamic-update-slice per layer
- stacked    : caches as scan carry, scatter indexed at [l, page, entry]
               (the in-place candidate: no full-layer slice/restack)
- nocache    : same scan, caches untouched (pure pass-through baseline)
"""

from __future__ import annotations

import functools
import sys, pathlib, time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

L, P, KH, PS, D, B = 32, 137, 8, 64, 128, 8


def scatter_layer(cache_l, kv, pages, entries):
    return cache_l.at[pages, :, entries].set(kv, mode="drop")


def make_runs():
    rng = np.random.default_rng(0)
    pages = jnp.asarray(rng.integers(0, P, B), jnp.int32)
    entries = jnp.asarray(rng.integers(0, PS, B), jnp.int32)
    kv = jnp.asarray(rng.standard_normal((B, KH, D)), jnp.bfloat16)

    def scan_xs_ys(kc, vc, x):
        def body(h, xs):
            klayer, vlayer = xs
            klayer = scatter_layer(klayer, kv + h[0, 0], pages, entries)
            vlayer = scatter_layer(vlayer, kv, pages, entries)
            return h * 1.000001, (klayer, vlayer)

        h, (kc, vc) = jax.lax.scan(body, x, (kc, vc))
        return h, kc, vc

    def carry_dus(kc, vc, x):
        def body(carry, l):
            h, kc, vc = carry
            klayer = jax.lax.dynamic_index_in_dim(kc, l, keepdims=False)
            klayer = scatter_layer(klayer, kv + h[0, 0], pages, entries)
            kc = jax.lax.dynamic_update_index_in_dim(kc, klayer, l, 0)
            vlayer = jax.lax.dynamic_index_in_dim(vc, l, keepdims=False)
            vlayer = scatter_layer(vlayer, kv, pages, entries)
            vc = jax.lax.dynamic_update_index_in_dim(vc, vlayer, l, 0)
            return (h * 1.000001, kc, vc), ()

        (h, kc, vc), _ = jax.lax.scan(body, (x, kc, vc), jnp.arange(L))
        return h, kc, vc

    def stacked(kc, vc, x):
        # FLAT row-index scatter: reshape the pool to (L*P*KH*ps, D) rows
        # (metadata-only) and scatter (T*KH) unique rows in one level.
        heads = jnp.arange(KH, dtype=jnp.int32)

        def body(carry, l):
            h, kc, vc = carry
            rows = ((l * P + pages)[:, None] * KH + heads[None, :]) * PS + entries[:, None]
            kflat = kc.reshape(L * P * KH * PS, D)
            kflat = kflat.at[rows].set(kv + h[0, 0], mode="drop")
            vflat = vc.reshape(L * P * KH * PS, D)
            vflat = vflat.at[rows].set(kv, mode="drop")
            return (h * 1.000001, kflat.reshape(kc.shape), vflat.reshape(vc.shape)), ()

        (h, kc, vc), _ = jax.lax.scan(body, (x, kc, vc), jnp.arange(L))
        return h, kc, vc

    def nocache(kc, vc, x):
        def body(h, xs):
            return h * 1.000001 + xs[0][0, 0, 0, 0].astype(jnp.float32) * 0, None

        h, _ = jax.lax.scan(body, x, (kc, vc))
        return h, kc, vc

    return dict(scan_xs_ys=scan_xs_ys, carry_dus=carry_dus, stacked=stacked, nocache=nocache)


def main():
    rng = np.random.default_rng(0)
    runs = make_runs()
    for name, fn in runs.items():
        kc = jnp.zeros((L, P, KH, PS, D), jnp.bfloat16)
        vc = jnp.zeros((L, P, KH, PS, D), jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)

        @functools.partial(jax.jit, static_argnames=("iters",), donate_argnums=(0, 1))
        def run(kc, vc, x, iters, fn=fn):
            def outer(carry, _):
                x, kc, vc = carry
                x, kc, vc = fn(kc, vc, x)
                return (x, kc, vc), ()

            (x, kc, vc), _ = jax.lax.scan(outer, (x, kc, vc), None, length=iters)
            return x, kc, vc

        I = 8
        x1, kc, vc = run(kc, vc, x, iters=2)
        _ = np.asarray(x1)
        x1, kc, vc = run(kc, vc, x1, iters=2 + I)
        _ = np.asarray(x1)
        diffs = []
        for _ in range(3):
            t0 = time.perf_counter()
            x1, kc, vc = run(kc, vc, x1, iters=2)
            _ = np.asarray(x1)
            t1 = time.perf_counter()
            x1, kc, vc = run(kc, vc, x1, iters=2 + I)
            _ = np.asarray(x1)
            t2 = time.perf_counter()
            diffs.append((t2 - t1) - (t1 - t0))
        per = min(diffs) / I
        gb = 2 * L * P * KH * PS * D * 2 / 1e9  # full K+V pool bytes
        print(f"{name:12s} {per*1e3:8.3f} ms/step  (pool {gb:.2f} GB)", flush=True)


if __name__ == "__main__":
    main()
