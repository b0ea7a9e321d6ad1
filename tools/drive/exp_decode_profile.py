# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Attribute the Llama-8B int4 decode step's time: GEMMs vs attention vs rest.

Times, in ONE window:
  step_ctx1024   : full 16-step-scan decode step, context 1024 (headline)
  step_ctx128    : same, context 128 (KV-read contribution ~= 1024 row minus this)
  gemm_<proj>    : the shipped planar launcher at each projection shape, m=8
                   (sum x 32 layers + lm_head = predicted GEMM time/step)
  attn_only      : paged_attention over the same cache geometry, per layer

All timings via readback differencing (block_until_ready lies on axon).
"""

from __future__ import annotations

import functools
import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.kernels.quantization.gemm import mixed_precision_gemm_launcher
from conch_tpu.models.linear import padded_out_features
from conch_tpu.utils.benchmark import robust_diff_time

B, GS = 8, 128

# Llama-3-8B projection shapes (K, N, count-per-layer) in the FUSED
# serving configuration (fuse_llama_params: wqkv = [wq|wk|wv],
# w_gateup = [gate|up]); "wk_unfused" kept as the small-N contrast row.
PROJS = [
    ("wqkv", 4096, 6144, 1),
    ("wo", 4096, 4096, 1),
    ("gateup", 4096, 28672, 1),
    ("down", 14336, 4096, 1),
    ("wk_unfused", 4096, 1024, 1),
]
LMHEAD = ("lm_head", 4096, 128256, 1)


def time_step(context, iters=12, steps_per_call=8):
    from conch_tpu.models.llama import LlamaConfig, init_kv_caches, llama_decode_step
    import importlib
    bench = importlib.import_module("bench")

    config = LlamaConfig.llama3_8b()
    page_size = 64
    pages_per_seq = -(-context // page_size) + 1
    num_pages = B * pages_per_seq + 1
    from conch_tpu.models.llama import fuse_llama_params

    params = fuse_llama_params(bench.build_params(config, "int4"))
    kc, vc = init_kv_caches(config, num_pages, page_size)
    rng = np.random.default_rng(0)
    block_tables = jnp.asarray(
        rng.permutation(num_pages - 1)[: B * pages_per_seq].reshape(B, pages_per_seq), jnp.int32
    )

    def multi_step(n, p, tokens0, positions0, kc, vc):
        def body(carry, _):
            tokens, positions, kc, vc = carry
            slots = (
                block_tables[jnp.arange(B), positions // page_size] * page_size
                + positions % page_size
            )
            logits, kc, vc = llama_decode_step(
                p, config, tokens, positions, positions + 1, block_tables, slots, kc, vc
            )
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            return (nxt, positions + 1, kc, vc), None

        carry, _ = jax.lax.scan(body, (tokens0, positions0, kc, vc), None, length=n)
        return carry

    stepN = jax.jit(functools.partial(multi_step, steps_per_call), donate_argnums=(2, 3))
    step2N = jax.jit(functools.partial(multi_step, 2 * steps_per_call), donate_argnums=(2, 3))

    tokens = jnp.asarray(rng.integers(0, config.vocab_size, B), jnp.int32)
    pos0 = jnp.full((B,), max(context - 1 - 3 * iters * steps_per_call, 0), jnp.int32)

    state = {"t": tokens, "p": pos0, "k": kc, "v": vc}

    def run(step):
        t, p, k, v = step(params, state["t"], state["p"], state["k"], state["v"])
        state.update(t=t, p=p, k=k, v=v)
        _ = np.asarray(state["t"])

    run(stepN); run(step2N)  # compile
    per, ok = robust_diff_time(lambda: run(stepN), lambda: run(step2N), steps_per_call)
    ms = per * 1e3
    flag = "" if ok else "  [unstable]"
    print(f"step_ctx{context:<6} {ms:8.3f} ms/step   ({B / (ms/1e3):.0f} tok/s){flag}", flush=True)
    return ms


def time_gemms(layout="magic"):
    """Per-projection shipped-launcher timing at m=8, L stacked layers.

    N is padded exactly as the model packs it (padded_out_features), so
    lm_head is measured on its real wide-tile shape, not the bn=768 one.
    Packed content is random int32 (bit patterns don't affect perf).
    """
    rng = np.random.default_rng(0)
    total = 0.0
    for name, K, N, cnt in PROJS + [LMHEAD]:
        NP = padded_out_features(N)
        L = max(2, min(8, (2 << 30) // (K * NP // 2)))
        packed = jnp.asarray(
            rng.integers(-(2**31), 2**31 - 1, size=(L, K // 8, NP), dtype=np.int64).astype(np.int32)
        )
        scales = jnp.asarray(rng.random((L, K // GS, NP), dtype=np.float32) * 0.01, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((B, K)), jnp.bfloat16)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(x, pk, sc, iters):
            # Stacked scalar-prefetch path (the model configuration):
            # weights stay scan-invariant; each iteration indexes a layer.
            # Scanning (pk, sc) as xs makes XLA copy every slice before the
            # pallas_call (exp_lmhead_r4b.log: 109 vs 817 GB/s).
            def outer(x, _):
                def body(x, li):
                    y = mixed_precision_gemm_launcher(
                        x, pk, sc, None, weight_size_bits=4, weight_bias=8,
                        group_size=GS, layout=layout, layer_index=li,
                    )
                    nf = min(K, NP)
                    return x.at[:, :nf].add(y[:, :nf].astype(x.dtype) * 1e-6), ()
                x, _ = jax.lax.scan(body, x, jnp.arange(pk.shape[0], dtype=jnp.int32))
                return x, ()
            x, _ = jax.lax.scan(outer, x, None, length=iters)
            return x

        I = 24
        _ = np.asarray(run(x, packed, scales, iters=2))
        _ = np.asarray(run(x, packed, scales, iters=2 + I))
        per, ok = robust_diff_time(
            lambda: np.asarray(run(x, packed, scales, iters=2)),
            lambda: np.asarray(run(x, packed, scales, iters=2 + I)),
            I * L,
        )
        gbps = (packed.nbytes // L + scales.nbytes // L) / per / 1e9
        elrate = (K * NP) / per / 1e9
        if not name.endswith("_unfused"):
            total += per * cnt * (32 if name != "lm_head" else 1)
        flag = "" if ok else "  [unstable]"
        print(
            f"gemm_{name:8s} {per*1e3:8.4f} ms  {gbps:7.1f} GB/s  {elrate:7.1f} Gel/s  (K={K}, N={NP}){flag}",
            flush=True,
        )
    print(f"gemm_total_per_step {total*1e3:8.3f} ms (32 layers + lm_head)", flush=True)


def time_attention(context):
    from conch_tpu.ops.attention import paged_attention
    from conch_tpu.utils.test_utils import create_paged_fixture

    fx = create_paged_fixture(
        np.random.default_rng(0), batch=B, num_q_heads=32, num_kv_heads=8,
        head_size=128, page_size=64, seq_lens=[context] * B, dtype=jnp.bfloat16,
    )

    @functools.partial(jax.jit, static_argnames=("iters",))
    def run(q, iters):
        def body(q, _):
            o = paged_attention(q, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens)
            return q + o * 1e-6, ()
        q, _ = jax.lax.scan(body, q, None, length=iters)
        return q

    I = 48
    q = fx.query
    _ = np.asarray(run(q, iters=2)); _ = np.asarray(run(q, iters=2 + I))
    per, ok = robust_diff_time(
        lambda: np.asarray(run(q, iters=2)),
        lambda: np.asarray(run(q, iters=2 + I)),
        I,
    )
    kv_bytes = B * context * 8 * 128 * 2 * 2
    flag = "" if ok else "  [unstable]"
    print(
        f"attn_ctx{context:<6} {per*1e3:8.4f} ms/layer  ({kv_bytes/per/1e9:7.1f} GB/s; x32 = {per*32*1e3:.3f} ms){flag}",
        flush=True,
    )


def main():
    time_step(1024)
    time_step(128)
    time_gemms()
    time_attention(1024)
    time_attention(128)


if __name__ == "__main__":
    main()
