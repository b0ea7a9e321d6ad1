# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Decode attention shoot-out (parity: reference
``benchmarks/paged_attention_vs_flash_benchmark.py``).

The reference compares its paged-attention Triton kernel against vLLM's
flash attention on decode shapes. The TPU equivalents compared here:

* ``paged_attention`` — the decode-only Pallas FlashDecoding kernel,
* ``varlen_attention`` — the general prefill+decode Pallas kernel driven
  with one query per sequence,
* ``xla_dense`` — XLA-fused dense softmax attention over the gathered
  contiguous cache (the "just let the compiler do it" baseline),
* ``jax_pallas_paged`` — the independent baseline: JAX's own shipped
  Pallas TPU paged-attention kernel
  (``jax.experimental.pallas.ops.tpu.paged_attention``), filling the
  role the reference gives vLLM's ``unified_attention``
  (reference ``benchmarks/paged_attention_vs_flash_benchmark.py``).
"""

import math

import jax
import jax.numpy as jnp

from benchmarks.common import make_parser, rng, run_and_report, runtime_zero_i32
from conch_tpu.ops.attention import paged_attention, varlen_attention
from conch_tpu.utils.test_utils import create_paged_fixture


def main() -> None:
    parser = make_parser("paged attention vs flash decode benchmark")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--num-q-heads", type=int, default=32)
    parser.add_argument("--num-kv-heads", type=int, default=8)
    parser.add_argument("--head-size", type=int, default=128)
    parser.add_argument("--seq-len", type=int, default=8192)
    parser.add_argument("--page-size", type=int, default=32)
    args = parser.parse_args()

    fx = create_paged_fixture(
        rng(args), batch=args.batch, num_q_heads=args.num_q_heads,
        num_kv_heads=args.num_kv_heads, head_size=args.head_size,
        page_size=args.page_size, seq_lens=[args.seq_len] * args.batch,
        dtype=jnp.bfloat16,
    )
    scale = 1.0 / math.sqrt(args.head_size)
    cu = jnp.arange(args.batch + 1, dtype=jnp.int32)

    @jax.jit
    def xla_dense(q, kc, vc, block_table, seq_lens):
        # Gather the paged cache into contiguous (batch, kv_heads, max_s, head).
        pages_per_seq = block_table.shape[1]
        k = kc[block_table]  # (b, pages, kv_heads, page, head)
        v = vc[block_table]
        b = q.shape[0]
        max_s = pages_per_seq * kc.shape[2]
        k = k.transpose(0, 2, 1, 3, 4).reshape(b, kc.shape[1], max_s, kc.shape[3])
        v = v.transpose(0, 2, 1, 3, 4).reshape(b, kc.shape[1], max_s, kc.shape[3])
        groups = q.shape[1] // kc.shape[1]
        qg = q.reshape(b, kc.shape[1], groups, q.shape[2]).astype(jnp.float32)
        logits = jnp.einsum("bhgd,bhsd->bhgs", qg, k.astype(jnp.float32)) * scale
        mask = jnp.arange(max_s)[None, None, None, :] < seq_lens[:, None, None, None]
        logits = jnp.where(mask, logits, -jnp.inf)
        p = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("bhgs,bhsd->bhgd", p, v.astype(jnp.float32))
        return out.reshape(b, q.shape[1], q.shape[2]).astype(q.dtype)

    kv_bytes = 2 * args.batch * args.seq_len * args.num_kv_heads * args.head_size * fx.key_cache.dtype.itemsize
    operands = (fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens)

    # Independent baseline: the Pallas paged-attention kernel that ships
    # with JAX itself. Its cache layout is (kv_heads, num_pages, page, head)
    # and it expects pre-scaled queries; transpose outside the timed region.
    cases_extra = []
    try:
        from jax.experimental.pallas.ops.tpu.paged_attention import (
            paged_attention as jax_paged_attention,
        )

        kc_hpsd = jnp.transpose(fx.key_cache, (1, 0, 2, 3))
        vc_hpsd = jnp.transpose(fx.value_cache, (1, 0, 2, 3))
        pages_per_block = min(8, fx.block_table.shape[1])

        @jax.jit
        def jax_paged(q, kc, vc, block_table, seq_lens):
            return jax_paged_attention(
                (q * scale).astype(q.dtype), kc, vc, seq_lens, block_table,
                pages_per_compute_block=pages_per_block,
            )

        cases_extra.append((
            f"jax_pallas_paged_b{args.batch}_s{args.seq_len}",
            lambda carry, q, kc, vc, bt, sl: jax_paged(q + carry, kc, vc, bt, sl),
            kv_bytes,
            (fx.query, kc_hpsd, vc_hpsd, fx.block_table, fx.seq_lens),
        ))
    except Exception as exc:  # pragma: no cover - platform-dependent import
        print(f"# jax_pallas_paged baseline unavailable: {exc}")

    run_and_report(args, [
        (
            f"paged_attention_b{args.batch}_s{args.seq_len}",
            lambda carry, q, kc, vc, bt, sl: paged_attention(q + carry, kc, vc, bt, sl, scale=scale),
            kv_bytes,
            operands,
        ),
        (
            f"varlen_decode_b{args.batch}_s{args.seq_len}",
            lambda carry, q, kc, vc, bt, sl: varlen_attention(
                q + carry, kc, vc, cu, 1, sl, args.seq_len, bt, causal=True, scale=scale
            ),
            kv_bytes,
            operands,
        ),
        (
            f"xla_dense_b{args.batch}_s{args.seq_len}",
            # The paged->contiguous gather must stay inside the timed loop
            # (a real engine's cache mutates every step): perturb the block
            # table with the carry so XLA cannot hoist it.
            lambda carry, q, kc, vc, bt, sl: xla_dense(
                q + carry, kc, vc, bt + runtime_zero_i32(carry), sl
            ),
            kv_bytes,
            operands,
        ),
    ] + cases_extra)


if __name__ == "__main__":
    main()
