# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""MLA attention kernel vs a dense jnp oracle.

The oracle gathers the paged latent cache back to dense per-sequence
[c_kv | k_pe] rows and computes masked MQA softmax directly.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.attention import mla_attention
from conch_tpu.ops.cache import reshape_and_cache_mla


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _dense_oracle(q, kv_dense, seq_lens, q_lens, latent, scale, causal):
    """q: (total, H, KD); kv_dense: (B, Lmax, KD). Returns (total, H, latent)."""
    outs = []
    start = 0
    for b, (sl, ql) in enumerate(zip(seq_lens, q_lens)):
        qb = q[start : start + ql]  # (ql, H, KD)
        kv = kv_dense[b, :sl]  # (sl, KD)
        s = np.einsum("qhd,kd->hqk", qb.astype(np.float64), kv.astype(np.float64)) * scale
        if causal:
            q_pos = sl - ql + np.arange(ql)
            mask = np.arange(sl)[None, :] <= q_pos[:, None]
            s = np.where(mask[None], s, -np.inf)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        outs.append(np.einsum("hqk,kd->qhd", p, kv[:, :latent].astype(np.float64)))
        start += ql
    return np.concatenate(outs, 0)


@pytest.mark.parametrize("qlens,seqs", [([1, 1, 1], [33, 200, 7]), ([40, 9, 1], [40, 121, 64])])
def test_mla_matches_dense(rng, qlens, seqs):
    latent, rope, kd = 128, 64, 256  # packed: 128 latent + 64 rope + 64 pad
    heads, ps = 8, 16
    batch = len(seqs)
    total = sum(qlens)

    q = rng.standard_normal((total, heads, kd)).astype(np.float32)
    q[..., latent + rope :] = 0.0
    kv_dense = rng.standard_normal((batch, max(seqs), kd)).astype(np.float32)
    kv_dense[..., latent + rope :] = 0.0

    # Scatter into a paged cache through the public cache op.
    pages_per = [-(-s // ps) for s in seqs]
    table_w = max(pages_per)
    perm = rng.permutation(sum(pages_per) + 3)
    bt = np.zeros((batch, table_w), np.int32)
    kv_rows, slots = [], []
    nxt = 0
    for b, s in enumerate(seqs):
        pages = [int(perm[nxt + j]) for j in range(pages_per[b])]
        nxt += pages_per[b]
        bt[b, : len(pages)] = pages
        for p in range(s):
            kv_rows.append(kv_dense[b, p])
            slots.append(pages[p // ps] * ps + p % ps)
    cache = jnp.zeros((sum(pages_per) + 3, ps, kd), jnp.float32)
    cache = reshape_and_cache_mla(
        jnp.asarray(np.stack(kv_rows)), cache, jnp.asarray(slots, jnp.int32)
    )

    cu = np.zeros(batch + 1, np.int32)
    cu[1:] = np.cumsum(qlens)
    scale = 1 / math.sqrt(192)
    out = mla_attention(
        jnp.asarray(q), cache, jnp.asarray(cu), max(qlens),
        jnp.asarray(seqs, jnp.int32), jnp.asarray(bt), scale=scale, latent=latent,
    )
    expect = _dense_oracle(q, kv_dense, seqs, qlens, latent, scale, True)
    np.testing.assert_allclose(np.asarray(out), expect, atol=2e-4, rtol=2e-4)


def test_mla_validation():
    q = jnp.zeros((2, 4, 256))
    cache = jnp.zeros((4, 16, 256))
    cu = jnp.asarray([0, 1, 2], jnp.int32)
    sl = jnp.ones(2, jnp.int32)
    bt = jnp.zeros((2, 4), jnp.int32)
    with pytest.raises(ValueError, match="latent"):
        mla_attention(q, cache, cu, 1, sl, bt, scale=1.0, latent=512)
    with pytest.raises(ValueError, match="packed"):
        mla_attention(q, jnp.zeros((4, 16, 128)), cu, 1, sl, bt, scale=1.0, latent=64)


def test_mla_int8_latent_cache(rng):
    """int8 latent cache: quantize-on-store + folded dequant matches the
    f32 cache within quantization error."""
    latent, rope, kd = 128, 64, 256
    heads, ps = 4, 16
    seq = 90
    kv = rng.standard_normal((seq, kd)).astype(np.float32) * 0.5
    kv[:, latent + rope :] = 0.0
    q = rng.standard_normal((1, heads, kd)).astype(np.float32)
    q[..., latent + rope :] = 0.0
    slots = np.arange(seq, dtype=np.int32)
    bt = np.arange(8, dtype=np.int32)[None, :]
    cu = np.asarray([0, 1], np.int32)
    sl = np.asarray([seq], np.int32)
    scale, kv_scale = 1 / np.sqrt(192), 1.0 / 32

    f32_cache = reshape_and_cache_mla(
        jnp.asarray(kv), jnp.zeros((8, ps, kd), jnp.float32), jnp.asarray(slots)
    )
    expect = mla_attention(
        jnp.asarray(q), f32_cache, jnp.asarray(cu), 1, jnp.asarray(sl),
        jnp.asarray(bt), scale=float(scale), latent=latent,
    )

    i8_cache = reshape_and_cache_mla(
        jnp.asarray(kv), jnp.zeros((8, ps, kd), jnp.int8), jnp.asarray(slots),
        scale=kv_scale,
    )
    assert i8_cache.dtype == jnp.int8
    got = mla_attention(
        jnp.asarray(q), i8_cache, jnp.asarray(cu), 1, jnp.asarray(sl),
        jnp.asarray(bt), scale=float(scale), latent=latent, kv_scale=kv_scale,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), atol=5e-2, rtol=5e-2)
