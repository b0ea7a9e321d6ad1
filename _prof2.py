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
    print(f"  {name}: {min(ts)*1e3:.3f} ms/step")

h0 = jnp.asarray(rng.normal(size=(8, 4096)), jnp.bfloat16)
bench_loop("pure-XLA mult", lambda h: (h * 1.0001).astype(jnp.bfloat16), h0)

from conch_tpu.kernels.normalization.rms_norm import rms_norm_launcher
w = jnp.ones((4096,), jnp.bfloat16)
bench_loop("1x rms_norm", lambda h: rms_norm_launcher(h, w, 1e-6), h0)
bench_loop("2x rms_norm", lambda h: rms_norm_launcher(rms_norm_launcher(h, w, 1e-6), w, 1e-6), h0)
bench_loop("4x rms_norm", lambda h: rms_norm_launcher(rms_norm_launcher(rms_norm_launcher(rms_norm_launcher(h, w, 1e-6), w, 1e-6), w, 1e-6), w, 1e-6), h0)

# XLA-only rms norm for comparison
def xla_rms(h):
    ms = jnp.mean(h.astype(jnp.float32)**2, -1, keepdims=True)
    return (h.astype(jnp.float32)*jax.lax.rsqrt(ms+1e-6)).astype(jnp.bfloat16)*w
bench_loop("1x xla rms", xla_rms, h0)

# big dense matmul loop (bandwidth sanity): 64MB bf16 weights
wd = jnp.asarray(rng.normal(size=(4096, 8192)), jnp.bfloat16)
bench_loop("dense M8 K4096 N8192 (64MB)", lambda h: jnp.dot(h, wd, preferred_element_type=jnp.float32)[:, :4096].astype(jnp.bfloat16), h0)
print("PROF2 DONE")
