import time, math
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)

def bench_loop(name, fn_step, init_carry, steps=200, iters=2):
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
bench_loop("paged_attn NEW b8 s1024 (32MB KV)", pa_step, q0)

# numeric check vs golden
from conch_tpu.reference.attention.attention import paged_attention as paged_ref
out = paged_attention_launcher(q0, kc, vc, bt, sl, scale=1.0/math.sqrt(D))
exp = paged_ref(q0, kc, vc, bt, sl, 1.0/math.sqrt(D))
print("  max err vs golden:", float(np.abs(np.asarray(out, np.float32)-exp).max()))
print("PROF7 DONE")
