import time
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)

def bench_loop(name, fn_step, init_carry, steps=1000, iters=2):
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, steps, lambda i, c: fn_step(c), carry)
    carry = jax.block_until_ready(run(init_carry))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry))
        ts.append((time.perf_counter() - t0) / steps)
    print(f"  {name}: {min(ts)*1e3:.4f} ms/step", flush=True)

h0 = jnp.asarray(rng.normal(size=(8, 4096)), jnp.bfloat16)
from conch_tpu.kernels.normalization.rms_norm import rms_norm_launcher
w = jnp.ones((4096,), jnp.bfloat16)
bench_loop("rms_norm pallas 8x4096", lambda h: rms_norm_launcher(h, w, 1e-6), h0)
def xla_rms(h):
    ms = jnp.mean(h.astype(jnp.float32)**2, -1, keepdims=True)
    return (h.astype(jnp.float32)*jax.lax.rsqrt(ms+1e-6)).astype(jnp.bfloat16)*w
bench_loop("rms_norm xla 8x4096", xla_rms, h0)

wd = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
bench_loop("dense matmul M8 (32MB)", lambda h: jnp.dot(h, wd, preferred_element_type=jnp.float32)[:, :4096].astype(jnp.bfloat16), h0, steps=200)

from conch_tpu.kernels.quantization.gemm import mixed_precision_gemm_launcher
K, N = 4096, 4096
packed = jnp.asarray(rng.integers(-2**31, 2**31-1, size=(K//8, N), dtype=np.int64).astype(np.int32))
scales = jnp.asarray(rng.random((K//128, N), dtype=np.float32)*0.01, jnp.bfloat16)
def mg_step(x):
    y = mixed_precision_gemm_launcher(x, packed, scales, None, weight_size_bits=4, weight_bias=8, group_size=128)
    return (y * 1e-3).astype(jnp.bfloat16)
bench_loop("mixed_gemm M8 (8MB packed)", mg_step, h0, steps=200)

import math
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
bench_loop("paged_attn b8 s1024 (32MB KV)", pa_step, q0, steps=200)
print("PROF4 DONE")
