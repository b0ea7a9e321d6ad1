# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Dump the optimized HLO of the multi-step decode and count big copies.

The stacked scalar-prefetch GEMM made isolated scans fast (923-1456 Gel/s)
but the full decode step REGRESSED 11.2 -> 20.3 ms/step; the delta (~9 ms)
matches one read+write of the whole 4 GB weight stack per step. This probe
compiles a small (4-layer) config for the real TPU backend and prints
every copy/fusion touching >8 MB buffers, so the copy's producer is
attributable.
"""

from __future__ import annotations

import collections
import functools
import re
import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))


def main():
    import importlib

    bench = importlib.import_module("bench")
    from conch_tpu.models.llama import LlamaConfig, init_kv_caches, llama_decode_step

    config = LlamaConfig.llama3_8b()
    import os
    if os.environ.get("HLO_SMALL", "1") == "1":
        object.__setattr__(config, "num_layers", 4)
    B, context, page_size = 8, 1024, 64
    pages_per_seq = -(-context // page_size) + 1
    num_pages = B * pages_per_seq + 1
    params = bench.build_params(config, "int4")
    kc, vc = init_kv_caches(config, num_pages, page_size)
    rng = np.random.default_rng(0)
    block_tables = jnp.asarray(
        rng.permutation(num_pages - 1)[: B * pages_per_seq].reshape(B, pages_per_seq), jnp.int32
    )

    def multi_step(p, tokens0, positions0, kc, vc):
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

        carry, _ = jax.lax.scan(body, (tokens0, positions0, kc, vc), None, length=4)
        return carry

    tokens = jnp.asarray(rng.integers(0, config.vocab_size, B), jnp.int32)
    pos0 = jnp.full((B,), 16, jnp.int32)

    lowered = jax.jit(multi_step, donate_argnums=(3, 4)).lower(params, tokens, pos0, kc, vc)
    compiled = lowered.compile()
    txt = compiled.as_text()
    print(f"optimized HLO: {len(txt)} chars", flush=True)
    with open(os.environ.get("HLO_OUT", "/tmp/decode_small_opt.hlo"), "w") as f:
        f.write(txt)

    # Count bytes by op kind for large-tensor ops.
    dtype_bytes = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2, "s8": 1, "u8": 1, "pred": 1}
    big = collections.Counter()
    lines = []
    for line in txt.splitlines():
        m = re.search(r"=\s+(\w+)\[([\d,]+)\]", line)
        if not m:
            continue
        dt, shape = m.group(1), m.group(2)
        if dt not in dtype_bytes:
            continue
        n = 1
        for d in shape.split(","):
            n *= int(d)
        nbytes = n * dtype_bytes[dt]
        if nbytes < 8 * 1024 * 1024:
            continue
        rhs = line.split("=", 1)[1].strip() if "=" in line else "?"
        rhs = rhs.split(" ", 1)[1] if rhs.split(" ", 1)[0].endswith("]") or "[" in rhs.split(" ",1)[0] else rhs
        key = re.match(r"[a-z][a-z-]*", rhs.strip())
        opname = key.group(0) if key else rhs[:20]
        if opname in ("copy", "copy-start", "copy-done", "dynamic-slice", "dynamic-update-slice", "fusion", "bitcast"):
            big[(opname, dt, shape)] += 1
            if opname.startswith("copy") or opname == "dynamic-slice":
                lines.append(line.strip()[:300])

    for (opname, dt, shape), cnt in sorted(big.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{cnt:4d} x {opname:22s} {dt}[{shape}]", flush=True)
    print("--- first 25 copy/dynamic-slice lines ---", flush=True)
    for line in lines[:25]:
        print(line, flush=True)


if __name__ == "__main__":
    main()
