# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Varlen prefill attention diagnosis (round 5).

b8 s2048 causal prefill measures ~14 ms — ~25 TFLOP/s, 10x off the MXU
roofline, with ~10 us of apparent overhead per (q-chunk, kv-chunk) pair.
Questions this probe answers in one window:

1. Does time scale with CHUNK-PAIR COUNT or with FLOPs? (sweep s and
   group count: pair count scales ~quadratically in s, FLOPs too, but
   chunk geometry changes the constant)
2. Does growing the chunks (fewer, bigger pairs) recover bandwidth?
   (sweep q_chunk_rows x chunk_tokens through the launcher's knobs)
3. Is the DMA machinery or the compute the bound? (kv chunk waves off =
   compute-only variant via window=0 skip... approximated by comparing
   a no-kv-reread shape: q_chunk_rows = all rows)
"""

from __future__ import annotations

import functools
import math
import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.kernels.attention.varlen_attention import varlen_attention_launcher
from conch_tpu.utils.benchmark import robust_diff_time
from conch_tpu.utils.test_utils import create_paged_fixture


def bench_case(tag, fx, scale, flops, cq=None, ct=None):
    kwargs = {}
    if cq is not None:
        kwargs["q_chunk_rows"] = cq
    if ct is not None:
        kwargs["chunk_tokens"] = ct

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(q, kc, vc, bt, sl, iters):
        def body(c, _):
            out = varlen_attention_launcher(
                q + c * 1e-30, kc, vc, fx.cu_seqlens_q, fx.max_seqlen_q,
                sl, bt, causal=True, scale=scale, **kwargs,
            )
            return out.reshape(-1)[0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    args = (fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens)
    I = 8
    try:
        float(np.asarray(run(*args, iters=1)))
        float(np.asarray(run(*args, iters=1 + I)))
    except Exception as e:  # noqa: BLE001
        print(f"{tag:34s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)
        return
    per, ok = robust_diff_time(
        lambda: float(np.asarray(run(*args, iters=1))),
        lambda: float(np.asarray(run(*args, iters=1 + I))),
        I,
    )
    tf = flops / per / 1e12
    flag = "" if ok else "  [unstable]"
    print(f"{tag:34s} {per*1e3:9.3f} ms  {tf:6.1f} TFLOP/s{flag}", flush=True)


def fixture(batch, s, qh, kh, ps=32):
    return create_paged_fixture(
        np.random.default_rng(0), batch=batch, num_q_heads=qh, num_kv_heads=kh,
        head_size=128, page_size=ps, seq_lens=[s] * batch, q_lens=[s] * batch,
        dtype=jnp.bfloat16,
    )


def causal_flops(batch, s, qh):
    return 2 * 2 * batch * qh * (s * (s + 1) // 2) * 128


def main():
    scale = 1.0 / math.sqrt(128)

    # 1. shape scaling
    for s in (512, 1024, 2048):
        fx = fixture(8, s, 32, 8)
        bench_case(f"b8_s{s}_qh32_kh8", fx, scale, causal_flops(8, s, 32))
    fx = fixture(8, 2048, 8, 8)
    bench_case("b8_s2048_qh8_kh8 (no GQA)", fx, scale, causal_flops(8, 2048, 8))
    fx = fixture(8, 2048, 32, 32)
    bench_case("b8_s2048_qh32_kh32 (MHA)", fx, scale, causal_flops(8, 2048, 32))

    # 2. chunk geometry sweep at the headline shape
    fx = fixture(8, 2048, 32, 8)
    fl = causal_flops(8, 2048, 32)
    for cq in (256, 512, 1024, 2048):
        for ct in (256, 512, 1024):
            bench_case(f"geom_cq{cq}_ct{ct}", fx, scale, fl, cq=cq, ct=ct)

    # 3. page size effect (DMA descriptor count halves at ps=64)
    fx = fixture(8, 2048, 32, 8, ps=64)
    bench_case("b8_s2048_ps64", fx, scale, fl)


if __name__ == "__main__":
    main()
