# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Reproduce the engine-benchmark varlen scoped-VMEM OOM (22.36M > 16M).

Geometry from tools/drive/logs/engine_r4.log: batch 8, 32 q heads / 8 kv
heads, head 128, page_size 16, max_seqlen_q 1024, stacked 32-layer cache
(32, 953, 8, 16, 128) bf16. Compile-only.
"""

from __future__ import annotations

import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.ops.attention import varlen_attention

B, QH, KH, D, PS, MAXQ, PAGES = 8, 32, 8, 128, 16, 1024, 953


def main():
    rng = np.random.default_rng(0)
    total_q = B * MAXQ
    q = jnp.asarray(rng.standard_normal((total_q, QH, D)), jnp.bfloat16)
    kc = jnp.zeros((32, PAGES, KH, PS, D), jnp.bfloat16)
    vc = jnp.zeros((32, PAGES, KH, PS, D), jnp.bfloat16)
    cu = jnp.arange(B + 1, dtype=jnp.int32) * MAXQ
    seq_lens = jnp.full((B,), MAXQ, jnp.int32)
    bt = jnp.asarray(
        rng.permutation(PAGES - 1)[: B * 119].reshape(B, 119), jnp.int32
    )

    fn = jax.jit(
        lambda q, kc, vc: varlen_attention(
            q, kc, vc, cu, MAXQ, seq_lens, MAXQ, bt, causal=True,
            layer_idx=jnp.int32(0),
        )
    )
    lowered = fn.lower(q, kc, vc)
    compiled = lowered.compile()
    print("compiled ok; out", compiled.output_shapes if hasattr(compiled, "output_shapes") else "?")


if __name__ == "__main__":
    main()
