# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Honest paged-decode attention timing + step re-profile.

The attn_only rows in exp_decode_profile are VMEM-residency artifacts (a
one-layer cache fits VMEM, so loop iterations re-read VMEM, printing
23 TB/s). Here the cache pool is 1 GB (K+V) and every iteration walks a
DIFFERENT random block table (rotated), so each call streams cold HBM.

Prints ms/call and achieved GB/s for the paged decode kernel at the
headline geometry (b8, 32q/8kv heads, d128, ps64, ctx1024), then re-runs
the decode-step rows (ctx 1024/128) for same-window attribution.
"""

from __future__ import annotations

import functools
import sys, pathlib, time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.kernels.attention.paged_attention import paged_attention_launcher

B, QH, KH, D, PS, CTX = 8, 32, 8, 128, 64, 1024
POOL_PAGES = 2048  # 2048 * (8, 64, 128) bf16 = 256 MB per cache
L = 2  # rotated block tables


def main():
    rng = np.random.default_rng(0)
    k_cache = jnp.asarray(
        rng.standard_normal((POOL_PAGES, KH, PS, D)).astype(np.float32), jnp.bfloat16
    )
    v_cache = jnp.asarray(
        rng.standard_normal((POOL_PAGES, KH, PS, D)).astype(np.float32), jnp.bfloat16
    )
    pages_per_seq = CTX // PS
    tables = jnp.asarray(
        np.stack([
            rng.permutation(POOL_PAGES)[: B * pages_per_seq].reshape(B, pages_per_seq)
            for _ in range(L)
        ]).astype(np.int32)
    )
    seq_lens = jnp.full((B,), CTX, jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, QH, D)), jnp.bfloat16)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(q, tables, kc, vc, iters):
        # caches ride as OPERANDS: closure constants embed in the compile
        # payload and overflow the tunnel's request limit (HTTP 413)
        def body(carry, i):
            q = carry
            bt = jax.lax.dynamic_index_in_dim(tables, i % L, keepdims=False)
            o = paged_attention_launcher(q, kc, vc, bt, seq_lens, scale=0.0883883)
            return q + o * 1e-6, ()

        q, _ = jax.lax.scan(body, q, jnp.arange(iters))
        return q

    I = 32
    _ = np.asarray(run(q, tables, k_cache, v_cache, iters=4))
    _ = np.asarray(run(q, tables, k_cache, v_cache, iters=4 + I))
    diffs = []
    for _ in range(3):
        t0 = time.perf_counter(); _ = np.asarray(run(q, tables, k_cache, v_cache, iters=4))
        t1 = time.perf_counter(); _ = np.asarray(run(q, tables, k_cache, v_cache, iters=4 + I))
        t2 = time.perf_counter()
        diffs.append((t2 - t1) - (t1 - t0))
    per = min(diffs) / I
    kv_bytes = B * CTX * KH * D * 2 * 2  # K+V read per call
    print(
        f"paged_attn_cold  {per*1e3:8.4f} ms/call  ({kv_bytes/per/1e9:7.1f} GB/s; "
        f"x32 layers = {per*32*1e3:.3f} ms)",
        flush=True,
    )

    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "prof", pathlib.Path(__file__).parent / "exp_decode_profile.py"
    )
    prof = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(prof)
    prof.time_step(1024)
    prof.time_step(128)


if __name__ == "__main__":
    main()
