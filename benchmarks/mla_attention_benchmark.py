# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""MLA attention microbenchmark (DeepSeek-V2 absorbed decode/prefill).

No reference counterpart (conch stops at GQA). Default shape: DeepSeek-
V2-Lite decode — 16 heads over a packed 640-wide latent cache. The
roofline is ONE read of the packed cache working set (MLA reads each KV
byte exactly once: K and V share the buffer).
"""

import math

import jax.numpy as jnp
import numpy as np

from benchmarks.common import make_parser, rng, run_and_report
from conch_tpu.ops.attention import mla_attention


def main() -> None:
    parser = make_parser("MLA attention benchmark")
    parser.add_argument("--batch", type=int, default=32)
    parser.add_argument("--num-heads", type=int, default=16)
    parser.add_argument("--latent", type=int, default=512)
    parser.add_argument("--rope", type=int, default=64)
    parser.add_argument("--seq-len", type=int, default=8192)
    parser.add_argument("--page-size", type=int, default=32)
    parser.add_argument("--q-len", type=int, default=1)
    args = parser.parse_args()

    r = rng(args)
    packed = -(-(args.latent + args.rope) // 128) * 128
    ps = args.page_size
    pages_per = -(-args.seq_len // ps)
    total_pages = args.batch * pages_per + 1

    q = jnp.asarray(
        np.where(
            np.arange(packed) < args.latent + args.rope,
            r.standard_normal((args.batch * args.q_len, args.num_heads, packed)),
            0.0,
        ),
        jnp.bfloat16,
    )
    cache = jnp.asarray(
        np.where(
            np.arange(packed) < args.latent + args.rope,
            r.standard_normal((total_pages, ps, packed)),
            0.0,
        ),
        jnp.bfloat16,
    )
    bt = jnp.asarray(
        r.permutation(args.batch * pages_per).reshape(args.batch, pages_per), jnp.int32
    )
    seq_lens = jnp.full((args.batch,), args.seq_len, jnp.int32)
    cu = jnp.asarray(np.arange(args.batch + 1) * args.q_len, jnp.int32)
    scale = 1.0 / math.sqrt(192)

    kv_bytes = args.batch * args.seq_len * packed * cache.dtype.itemsize
    run_and_report(args, [(
        f"mla_attention_b{args.batch}_s{args.seq_len}_q{args.q_len}",
        lambda carry, qq, kc, bt_, sl: mla_attention(
            qq + carry, kc, cu, args.q_len, sl, bt_, scale=scale, latent=args.latent
        ),
        kv_bytes,
        (q, cache, bt, seq_lens),
    )])


if __name__ == "__main__":
    main()
