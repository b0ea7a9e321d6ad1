import time
import jax, jax.numpy as jnp, numpy as np
rng = np.random.default_rng(0)

def bench_loop(name, fn_step, init_carry, steps=100, iters=2, work_bytes=None, flops=None):
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, steps, lambda i, c: fn_step(c), carry)
    carry = jax.block_until_ready(run(init_carry))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        carry = jax.block_until_ready(run(carry))
        ts.append((time.perf_counter() - t0) / steps)
    t = min(ts)
    extra = ""
    if work_bytes: extra += f" -> {work_bytes/t/1e9:.0f} GB/s"
    if flops: extra += f" -> {flops/t/1e12:.1f} TFLOP/s"
    print(f"  {name}: {t*1e3:.4f} ms/step{extra}", flush=True)

# HBM copy bandwidth: 256MB array, negate it (read+write 512MB)
big = jnp.asarray(rng.normal(size=(128*1024*1024,)), jnp.bfloat16)  # 256MB
bench_loop("copy 256MB", lambda x: -x, big, steps=20, work_bytes=2*big.size*2)

# MXU peak: 4096^3 matmul
a = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
b = jnp.asarray(rng.normal(size=(4096, 4096)), jnp.bfloat16)
bench_loop("matmul 4096^3", lambda x: jnp.dot(x, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16), a, steps=20, flops=2*4096**3)

# GEMV bandwidth: M=8 against 32MB weights (reads w every time)
x8 = jnp.asarray(rng.normal(size=(8, 4096)), jnp.bfloat16)
bench_loop("gemv M8 32MB", lambda x: jnp.dot(x, b, preferred_element_type=jnp.float32)[:, :4096].astype(jnp.bfloat16), x8, steps=100, work_bytes=2*4096*4096)
# GEMV M=256
x256 = jnp.asarray(rng.normal(size=(256, 4096)), jnp.bfloat16)
bench_loop("gemm M256 32MB", lambda x: jnp.dot(x, b, preferred_element_type=jnp.float32)[:, :4096].astype(jnp.bfloat16), x256, steps=100, work_bytes=2*4096*4096)
print("PROF6 DONE")
