import time
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)

def bench_loop(name, fn_step, init_carry, steps=50, iters=3):
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, steps, lambda i, c: fn_step(c), carry)
    carry = jax.block_until_ready(run(init_carry))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry))
        ts.append((time.perf_counter() - t0) / steps)
    print(f"  {name}: {min(ts)*1e3:.4f} ms/step")

h0 = jnp.asarray(rng.normal(size=(8, 4096)), jnp.bfloat16)
bench_loop("astype f32 + back", lambda h: h.astype(jnp.float32).astype(jnp.bfloat16), h0)
bench_loop("sum keepdims bf16", lambda h: h + jnp.sum(h, -1, keepdims=True) * 1e-6, h0)
w128 = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
bench_loop("matmul bf16->bf16 pref bf16", lambda h: jnp.dot(h, w128).astype(jnp.bfloat16), h0)
bench_loop("rsqrt", lambda h: jax.lax.rsqrt(jnp.abs(h) + 1.0).astype(jnp.bfloat16), h0)
bench_loop("exp", lambda h: jnp.exp(h * 1e-3).astype(jnp.bfloat16), h0)
# scan instead of fori_loop
def bench_scan(name, fn_step, init_carry, steps=50, iters=3):
    @jax.jit
    def run(carry):
        c, _ = jax.lax.scan(lambda c, _: (fn_step(c), None), carry, None, length=steps)
        return c
    carry = jax.block_until_ready(run(init_carry))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry))
        ts.append((time.perf_counter() - t0) / steps)
    print(f"  {name}: {min(ts)*1e3:.4f} ms/step")
bench_scan("scan: sum keepdims", lambda h: h + jnp.sum(h, -1, keepdims=True) * 1e-6, h0)
# unrolled 50 steps, no loop
@jax.jit
def unrolled(h):
    for _ in range(50):
        h = h + jnp.sum(h, -1, keepdims=True) * 1e-6
    return h
h = jax.block_until_ready(unrolled(h0))
ts = []
for _ in range(3):
    t0 = time.perf_counter(); h = jax.block_until_ready(unrolled(h)); ts.append((time.perf_counter()-t0)/50)
print(f"  unrolled sum: {min(ts)*1e3:.4f} ms/step")
print("PROF3 DONE")
