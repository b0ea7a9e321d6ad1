# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Localize the ~2 ms/step gap between wall-clock and diff-timed decode.

The r5b profile diff-times the ctx-1024 step at 7.0 ms while bench.py
wall-clocks ~9.1 ms/step at both 16- and 32-step scans. Per-call fixed
cost would shrink with scan length (it didn't), so something per-step is
invisible to the marginal diff. Suspects measured here, one window:

  wallclock_sN  : bench-identical multi-step wall-clock at N in {8,16,32}
  embed_take    : jnp.take of 8 rows from the (129024, 4096) bf16 table
  argmax_vocab  : jnp.argmax over (8, 129024) f32 logits
  noargmax_s16  : same 16-step scan but constant next-token (no argmax,
                  no embed of a data-dependent id) — isolates the
                  argmax+gather chain inside the scan
"""

from __future__ import annotations

import functools
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


B = 8
CONTEXT = 1024


def wall(fn, iters=8):
    """Median wall-clock of fn(); fn owns its state and syncs internally."""
    fn()  # warm
    fn()
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    from conch_tpu.models.llama import LlamaConfig, fuse_llama_params, init_kv_caches, llama_decode_step

    import bench

    config = LlamaConfig.llama3_8b()
    page_size = 64
    # 10 timed calls x <=32 steps = <=320 tokens of growth per variant.
    pages_per_seq = -(-(CONTEXT + 400) // page_size) + 1
    num_pages = B * pages_per_seq + 1
    print("building params ...", file=sys.stderr, flush=True)
    params = fuse_llama_params(bench.build_params(config, "int4"))
    kc0, vc0 = init_kv_caches(config, num_pages, page_size)
    rng = np.random.default_rng(0)
    block_tables = jnp.asarray(
        rng.permutation(num_pages - 1)[: B * pages_per_seq].reshape(B, pages_per_seq), jnp.int32
    )
    tokens0 = jnp.asarray(rng.integers(0, config.vocab_size, B), jnp.int32)

    def multi_step(n, feedback, p, tokens0, positions0, kc, vc):
        def body(carry, _):
            tokens, positions, kc, vc = carry
            slots = (
                block_tables[jnp.arange(B), positions // page_size] * page_size
                + positions % page_size
            )
            logits, kc, vc = llama_decode_step(
                p, config, tokens, positions, positions + 1, block_tables, slots, kc, vc
            )
            if feedback:
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                nxt = tokens  # constant: no argmax -> embed dependency chain
            return (nxt, positions + 1, kc, vc), None

        carry, _ = jax.lax.scan(body, (tokens0, positions0, kc, vc), None, length=n)
        return carry

    pos0 = jnp.full((B,), CONTEXT - 1, jnp.int32)

    def time_variant(name, n, feedback):
        step = jax.jit(
            functools.partial(multi_step, n, feedback), donate_argnums=(3, 4)
        )
        state = {"t": tokens0, "p": pos0, "k": jnp.copy(kc0), "v": jnp.copy(vc0)}

        def call():
            t, p, k, v = step(params, state["t"], state["p"], state["k"], state["v"])
            state.update(t=t, p=p, k=k, v=v)
            _ = np.asarray(t)  # force full sync through the tunnel

        ms = wall(call) / n * 1e3
        print(f"{name:<14} {ms:8.3f} ms/step", flush=True)
        del state

    for n in (8, 16, 32):
        time_variant(f"wallclock_s{n}", n, True)
    time_variant("noargmax_s16", 16, False)

    emb = params["embedding"]
    take = jax.jit(lambda ids: jnp.take(emb, ids, axis=0))
    ms = wall(lambda: take(tokens0)) * 1e3
    print(f"embed_take     {ms:8.3f} ms", flush=True)

    logits = jnp.asarray(rng.standard_normal((B, 129024)), jnp.float32)
    am = jax.jit(lambda x: jnp.argmax(x, axis=-1))
    ms = wall(lambda: am(logits)) * 1e3
    print(f"argmax_vocab   {ms:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
