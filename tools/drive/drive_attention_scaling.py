"""TPU drive: attention DMA scaling sanity + varlen causal-clamp check.

1. paged_attention time must scale ~linearly with seq_len (it is
   page-DMA-bound); a flat curve means timing or DMA accounting is broken.
2. varlen_attention causal prefill must match the jnp reference after the
   index-map clamp.

Caches are generated on-device (jax.random) — host->tunnel transfer of
multi-GB fixtures is slower than the benchmark itself.
"""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())

from conch_tpu.ops.attention import paged_attention, varlen_attention
from conch_tpu.reference.attention.attention import varlen_attention as varlen_ref

rng = np.random.default_rng(0)


def timed(fn, iters=20):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn())
    return (time.perf_counter() - t0) / iters * 1e3, out


def device_fixture(batch, kv_heads, q_heads, head, page_size, seq, key=0):
    pages_per_seq = seq // page_size
    total_pages = batch * pages_per_seq
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    kc = jax.random.normal(ks[0], (total_pages, kv_heads, page_size, head), jnp.bfloat16)
    vc = jax.random.normal(ks[1], (total_pages, kv_heads, page_size, head), jnp.bfloat16)
    q = jax.random.normal(ks[2], (batch, q_heads, head), jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(total_pages).reshape(batch, pages_per_seq), jnp.int32)
    sl = jnp.full((batch,), seq, jnp.int32)
    return q, kc, vc, bt, sl


scale = 1.0 / math.sqrt(128)

# 1. paged attention seq scaling (batch 8 keeps fixtures small)
for seq in (1024, 8192):
    q, kc, vc, bt, sl = device_fixture(8, 8, 32, 128, 32, seq)
    jax.block_until_ready((q, kc, vc))
    ms, _ = timed(lambda: paged_attention(q, kc, vc, bt, sl, scale=scale))
    bytes_read = 8 * seq * 8 * 128 * 2 * 2
    print(f"paged b8 seq={seq}: {ms:.3f} ms -> {bytes_read / (ms / 1e3) / 1e9:.0f} GB/s effective")

# 2. varlen causal prefill: correctness after the index-map clamp
for seq in (512,):
    batch = 2
    q_heads, kv_heads, head, page_size = 16, 8, 128, 32
    pages_per_seq = seq // page_size
    total_pages = batch * pages_per_seq
    kc = jnp.asarray(rng.normal(size=(total_pages, kv_heads, page_size, head)), jnp.bfloat16)
    vc = jnp.asarray(rng.normal(size=(total_pages, kv_heads, page_size, head)), jnp.bfloat16)
    qv = jnp.asarray(rng.normal(size=(batch * seq, q_heads, head)), jnp.bfloat16)
    bt = jnp.asarray(rng.permutation(total_pages).reshape(batch, pages_per_seq), jnp.int32)
    sl = jnp.full((batch,), seq, jnp.int32)
    cu = jnp.arange(batch + 1, dtype=jnp.int32) * seq
    ms, out = timed(lambda: varlen_attention(
        qv, kc, vc, cu, seq, sl, seq, bt, causal=True, scale=scale
    ), iters=5)
    ref = varlen_ref(qv, kc, vc, cu, sl, bt, scale=scale, causal=True)
    err = np.max(np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)))
    print(f"varlen causal seq={seq}: {ms:.3f} ms, max err {err:.4f}")
    assert err < 0.05, "varlen mismatch after clamp!"

print("ATTENTION SCALING DRIVE OK")
