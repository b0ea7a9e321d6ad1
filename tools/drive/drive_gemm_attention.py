"""TPU drive: GEMMs + attention + cache + engine decode path."""
import time, math
import jax, jax.numpy as jnp, numpy as np
print("backend:", jax.devices())
rng = np.random.default_rng(0)

def timed(name, fn, iters=10):
    out = jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(fn())
    print(f"  {name}: {(time.perf_counter()-t0)/iters*1e3:.3f} ms")
    return out

# mixed gemm
from conch_tpu.ops.quantization.gemm import mixed_precision_gemm, scaled_gemm
from conch_tpu.utils.quant_utils import quantize_weights, pack_rows
from conch_tpu.types import scalar_types
K, N, M = 4096, 4096, 128
wf = rng.normal(size=(K, N)).astype(np.float32) * 0.02
w_ref_d, w_q, w_s, _ = quantize_weights(wf, scalar_types.uint4b8, 128)
w_packed = jnp.asarray(pack_rows(w_q, 4))
xg = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
out = timed(f"mixed_gemm M{M}", lambda: mixed_precision_gemm(xg, w_packed, jnp.asarray(w_s, dtype=jnp.bfloat16), None, 4, 8, 128))
exp = np.asarray(xg, np.float32) @ w_ref_d
print("  mixed rel err:", np.abs(np.asarray(out, np.float32)-exp).max()/np.abs(exp).mean())

a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), jnp.int8)
b8 = jnp.asarray(rng.integers(-127, 127, size=(K, N)), jnp.int8)
out8 = timed("scaled_gemm int8", lambda: scaled_gemm(a8, b8, jnp.full((M,), 0.01, jnp.float32), jnp.full((N,), 0.02, jnp.float32), jnp.bfloat16))
exp8 = (np.asarray(a8, np.int64) @ np.asarray(b8, np.int64)) * 0.0002
print("  scaled rel err:", np.abs(np.asarray(out8, np.float64)-exp8).max()/np.abs(exp8).mean())

# attention + cache
from conch_tpu.ops.attention import paged_attention, varlen_attention
from conch_tpu.ops.cache import reshape_and_cache
from conch_tpu.utils.test_utils import create_paged_fixture
from conch_tpu.reference.attention.attention import paged_attention as paged_ref

fx = create_paged_fixture(rng, batch=8, num_q_heads=32, num_kv_heads=8, head_size=128,
                          page_size=32, seq_lens=[2048]*8, dtype=jnp.bfloat16)
scale = 1.0/math.sqrt(128)
out = timed("paged_attention b8 s2048", lambda: paged_attention(fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens, scale=scale))
exp = paged_ref(fx.query, fx.key_cache, fx.value_cache, fx.block_table, fx.seq_lens, scale)
print("  paged attn max err:", np.abs(np.asarray(out, np.float32)-exp).max())

fx2 = create_paged_fixture(rng, batch=4, num_q_heads=32, num_kv_heads=8, head_size=128,
                           page_size=32, seq_lens=[512]*4, q_lens=[512]*4, dtype=jnp.bfloat16)
out2 = timed("varlen prefill b4 s512", lambda: varlen_attention(
    fx2.query, fx2.key_cache, fx2.value_cache, fx2.cu_seqlens_q, fx2.max_seqlen_q,
    fx2.seq_lens, fx2.max_seqlen_k, fx2.block_table, causal=True, scale=scale))
from conch_tpu.reference.attention.attention import varlen_attention as varlen_ref
exp2 = varlen_ref(fx2.query, fx2.key_cache, fx2.value_cache, fx2.cu_seqlens_q, fx2.seq_lens, fx2.block_table, scale, True)
print("  varlen max err:", np.abs(np.asarray(out2, np.float32)-exp2).max())

key = jnp.asarray(rng.normal(size=(256, 8, 128)), jnp.bfloat16)
val = jnp.asarray(rng.normal(size=(256, 8, 128)), jnp.bfloat16)
slots = jnp.asarray(rng.choice(512*32, 256, replace=False), jnp.int32)
state = {"k": jnp.zeros((512, 8, 32, 128), jnp.bfloat16), "v": jnp.zeros((512, 8, 32, 128), jnp.bfloat16)}
def rc():
    state["k"], state["v"] = reshape_and_cache(key, val, state["k"], state["v"], slots)
    return state["k"]
timed("reshape_and_cache 256 tok", rc)
print("TPU DRIVE 2 OK")
