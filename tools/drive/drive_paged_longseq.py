"""TPU check: paged_attention correctness at long seq + true timing."""
import math
import time

import jax
import jax.numpy as jnp
import numpy as np

print("devices:", jax.devices())
from conch_tpu.ops.attention import paged_attention

rng = np.random.default_rng(0)
batch, kv_heads, q_heads, head, page_size, seq = 4, 8, 32, 128, 32, 8192
pages_per_seq = seq // page_size
total_pages = batch * pages_per_seq
ks = jax.random.split(jax.random.PRNGKey(0), 3)
kc = jax.random.normal(ks[0], (total_pages, kv_heads, page_size, head), jnp.bfloat16)
vc = jax.random.normal(ks[1], (total_pages, kv_heads, page_size, head), jnp.bfloat16)
q = jax.random.normal(ks[2], (batch, q_heads, head), jnp.bfloat16)
bt = jnp.asarray(rng.permutation(total_pages).reshape(batch, pages_per_seq), jnp.int32)
sl = jnp.full((batch,), seq, jnp.int32)
scale = 1.0 / math.sqrt(head)

out = jax.block_until_ready(paged_attention(q, kc, vc, bt, sl, scale=scale))

# Dense on-device reference via einsum over the gathered cache.
@jax.jit
def dense_ref(q, kc, vc, bt, sl):
    k = kc[bt]  # (b, pages, kh, ps, d)
    v = vc[bt]
    b = q.shape[0]
    k = k.transpose(0, 2, 1, 3, 4).reshape(b, kv_heads, seq, head).astype(jnp.float32)
    v = v.transpose(0, 2, 1, 3, 4).reshape(b, kv_heads, seq, head).astype(jnp.float32)
    group = q_heads // kv_heads
    qg = q.reshape(b, kv_heads, group, head).astype(jnp.float32)
    s = jnp.einsum("bhgd,bhsd->bhgs", qg, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhgs,bhsd->bhgd", p, v)
    return o.reshape(b, q_heads, head)

ref = jax.block_until_ready(dense_ref(q, kc, vc, bt, sl))
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
print(f"seq={seq}: max err vs dense ref = {err:.5f}")
assert err < 0.02, "PAGED ATTENTION WRONG AT LONG SEQ"

# timing both
for name, fn in (("paged", lambda: paged_attention(q, kc, vc, bt, sl, scale=scale)),
                 ("dense_ref", lambda: dense_ref(q, kc, vc, bt, sl))):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(20):
        jax.block_until_ready(fn())
    ms = (time.perf_counter() - t0) / 20 * 1e3
    gbs = batch * seq * kv_heads * head * 2 * 2 / (ms / 1e3) / 1e9
    print(f"{name}: {ms:.3f} ms ({gbs:.0f} GB/s effective)")
print("OK")
