"""Isolate mixed-gemm cost: unpack vs scales vs dot."""
import time, functools
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
rng = np.random.default_rng(0)

M, K, N = 8, 4096, 4096
GROUP = 128
bm, bn, bk = 16, 256, 256
packed = jnp.asarray(rng.integers(-2**31, 2**31-1, size=(K//8, N), dtype=np.int64).astype(np.int32))
scales = jnp.asarray(rng.random((K//GROUP, N), dtype=np.float32)*0.01, jnp.bfloat16)
wd_bf16 = jnp.asarray(rng.normal(size=(K, N)), jnp.bfloat16)

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

def make_kernel(mode):
    def kern(x_ref, b_ref, s_ref, o_ref, acc_ref):
        k = pl.program_id(2)
        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)
        if mode == "full" or mode == "noscale":
            fields = [(jax.lax.shift_right_logical(b_ref[...], 4*i) & 15) for i in range(8)]
            codes = jnp.stack(fields, axis=1).reshape(bk, bn).astype(jnp.float32) - 8.0
        elif mode == "nounpack":
            codes = jnp.broadcast_to(b_ref[...].astype(jnp.float32), (8, bk//8, bn)).reshape(bk, bn)
        if mode == "full":
            gp = s_ref.shape[0]
            row_group = (k*bk + jax.lax.broadcasted_iota(jnp.int32, (bk, gp), 0)) // GROUP
            gcol = jax.lax.broadcasted_iota(jnp.int32, (bk, gp), 1)
            onehot = (row_group == gcol).astype(jnp.float32)
            w = codes * jnp.dot(onehot, s_ref[...].astype(jnp.float32), preferred_element_type=jnp.float32)
        else:
            w = codes * 0.01
        x = x_ref[...]
        acc_ref[...] += jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32)
        @pl.when(k == (K//bk) - 1)
        def _():
            o_ref[...] = acc_ref[...].astype(o_ref.dtype)
    return kern

def launch(mode, x):
    grid = (1, N//bn, K//bk)
    return pl.pallas_call(
        make_kernel(mode),
        out_shape=jax.ShapeDtypeStruct((bm, N), jnp.bfloat16),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i,j,k: (i,k), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk//8, bn), lambda i,j,k: (k,j), memory_space=pltpu.VMEM),
            pl.BlockSpec((K//GROUP, bn), lambda i,j,k: (0,j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i,j,k: (i,j), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(dimension_semantics=("parallel","parallel","arbitrary")),
    )(x, packed, scales)

x0 = jnp.asarray(rng.normal(size=(bm, K)), jnp.bfloat16)
for mode in ("full", "noscale", "nounpack"):
    bench_loop(f"mixed[{mode}]", lambda x, m=mode: (launch(m, x)[:, :K]*1e-3).astype(jnp.bfloat16), x0)

bench_loop("dense bf16", lambda x: (jnp.dot(x, wd_bf16, preferred_element_type=jnp.float32)[:, :K]*1e-3).astype(jnp.bfloat16), x0)
print("PROF5 DONE")
