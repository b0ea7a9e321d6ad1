import time, math
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)

def bench_loop(name, fn_step, init_carry, steps=50, iters=3):
    """fn_step: carry -> carry, looped in one jit."""
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, steps, lambda i, c: fn_step(c), carry)
    carry = jax.block_until_ready(run(init_carry))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry))
        ts.append((time.perf_counter() - t0) / steps)
    print(f"  {name}: {min(ts)*1e3:.3f} ms/step")

# 1. mixed gemm M=8 (decode GEMV regime)
from conch_tpu.kernels.quantization.gemm import mixed_precision_gemm_launcher
K, N = 4096, 4096
packed = jnp.asarray(rng.integers(-2**31, 2**31-1, size=(K//8, N), dtype=np.int64).astype(np.int32))
scales = jnp.asarray(rng.random((K//128, N), dtype=np.float32)*0.01, jnp.bfloat16)
x0 = jnp.asarray(rng.normal(size=(8, K)), jnp.bfloat16)
def mg_step(x):
    y = mixed_precision_gemm_launcher(x, packed, scales, None, weight_size_bits=4, weight_bias=8, group_size=128)
    return (y[:, :K] * 1e-3).astype(jnp.bfloat16)
bench_loop("mixed_gemm M8 K4096 N4096", mg_step, x0)

# 2. dense bf16 same shape
wd = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)
def dg_step(x):
    y = jnp.dot(x, wd, preferred_element_type=jnp.float32)
    return (y[:, :K] * 1e-3).astype(jnp.bfloat16)
bench_loop("dense_bf16 M8 K4096 N4096", dg_step, x0)

# 3. paged attention b8 s1024
from conch_tpu.kernels.attention.paged_attention import paged_attention_launcher
B, KH, QH, D, PS = 8, 8, 32, 128, 64
pages_per = 1024 // PS
P = B * pages_per + 1
kc = jnp.asarray(rng.normal(size=(P, KH, PS, D)), jnp.bfloat16)
vc = jnp.asarray(rng.normal(size=(P, KH, PS, D)), jnp.bfloat16)
bt = jnp.asarray(rng.permutation(P-1)[:B*pages_per].reshape(B, pages_per), jnp.int32)
sl = jnp.full((B,), 1024, jnp.int32)
q0 = jnp.asarray(rng.normal(size=(B, QH, D)), jnp.bfloat16)
def pa_step(q):
    o = paged_attention_launcher(q, kc, vc, bt, sl, scale=1.0/math.sqrt(D))
    return (o * 1e-3 + q * 0.999).astype(jnp.bfloat16)
bench_loop("paged_attn b8 s1024 ps64", pa_step, q0)

# 4. rms_norm 8x4096
from conch_tpu.kernels.normalization.rms_norm import rms_norm_launcher
w = jnp.ones((4096,), jnp.bfloat16)
h0 = jnp.asarray(rng.normal(size=(8, 4096)), jnp.bfloat16)
def rn_step(h):
    return rms_norm_launcher(h, w, 1e-6) + h * 1e-6
bench_loop("rms_norm 8x4096", rn_step, h0)

# 5. rope 8 tokens
from conch_tpu.kernels.embedding.rotary_embedding import rotary_embedding_launcher
from conch_tpu.reference.embedding.rotary_embedding import compute_cos_sin_cache
cache = compute_cos_sin_cache(5e5, 128, 2048)
pos = jnp.arange(8, dtype=jnp.int32)
qq = jnp.asarray(rng.normal(size=(8, 32*128)), jnp.bfloat16)
kk = jnp.asarray(rng.normal(size=(8, 8*128)), jnp.bfloat16)
def rope_step(c):
    q2, k2 = rotary_embedding_launcher(pos, c, kk, 128, cache)
    return (q2 * 0.999).astype(jnp.bfloat16)
bench_loop("rope 8 tok", rope_step, qq)
print("PROF1 DONE")
