# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Same-window varlen prefill tuning drive: sweep (q_chunk_rows, chunk_tokens).

Usage: python tools/drive/drive_varlen_tuning.py [--seq 2048] [--batch 8]
"""

import argparse
import math
import time

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--seq", type=int, default=2048)
    p.add_argument("--loop", type=int, default=10)
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--causal", type=int, default=1)
    args = p.parse_args()

    from conch_tpu.kernels.attention.varlen_attention import varlen_attention_launcher
    from conch_tpu.utils.test_utils import create_paged_fixture

    b, s = args.batch, args.seq
    nq, nkv, d, ps = 32, 8, 128, 32
    fx = create_paged_fixture(
        np.random.default_rng(0), batch=b, num_q_heads=nq, num_kv_heads=nkv,
        head_size=d, page_size=ps, seq_lens=[s] * b, q_lens=[s] * b,
        dtype=jnp.bfloat16,
    )
    scale = 1 / math.sqrt(d)
    causal = bool(args.causal)
    ref = None

    for (cq, ct) in [(512, 1024), (1024, 512), (1024, 256)]:
        fn = jax.jit(lambda q, cq=cq, ct=ct: varlen_attention_launcher(
            q, fx.key_cache, fx.value_cache, fx.cu_seqlens_q, fx.max_seqlen_q,
            fx.seq_lens, fx.block_table, scale=scale, causal=causal,
            chunk_tokens=ct, q_chunk_rows=cq,
        ))
        try:
            out = fn(fx.query)
            jax.block_until_ready(out)
        except Exception as e:
            print(f"cq={cq} ct={ct}: FAILED {type(e).__name__}: {str(e)[:160]}")
            continue
        if ref is None:
            ref = np.asarray(out, np.float32)
        else:
            err = np.max(np.abs(np.asarray(out, np.float32) - ref))
            assert err < 2e-2, f"cq={cq} ct={ct} diverged: {err}"
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            for _ in range(args.loop):
                out = fn(fx.query)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.loop)
        frac = 0.5 if causal else 1.0
        tf = frac * 4 * b * nq * s * s * d / best / 1e12
        print(f"cq={cq} ct={ct}: {best*1e3:.3f} ms  {tf:.1f} TFLOP/s")


if __name__ == "__main__":
    main()
