"""Drive conch_tpu's public API on the default backend (real TPU via axon)."""
import time

import jax
import jax.numpy as jnp
import numpy as np

print("backend:", jax.default_backend(), jax.devices())

rng = np.random.default_rng(0)

from conch_tpu.ops.normalization import rms_norm, fused_add_rms_norm, gemma_rms_norm
from conch_tpu.ops.activation import silu_and_mul, gelu_tanh_and_mul
from conch_tpu.ops.embedding import rotary_embedding
from conch_tpu.ops.quantization.int8 import scaled_int8_quant
from conch_tpu.ops.quantization.fp8 import scaled_fp8_quant
from conch_tpu.ops.quantization.bitsandbytes import quantize_4bit, dequantize_4bit
from conch_tpu.reference.embedding.rotary_embedding import compute_cos_sin_cache
from conch_tpu.reference.normalization.rms_norm import rms_norm as rms_ref

def timed(name, fn):
    out = jax.block_until_ready(fn())  # compile
    t0 = time.perf_counter()
    for _ in range(20):
        out = jax.block_until_ready(fn())
    dt = (time.perf_counter() - t0) / 20 * 1e3
    print(f"  {name}: {dt:.3f} ms")
    return out

# 1. RMS norm, Llama-8B shape
x = jnp.asarray(rng.normal(size=(1024, 4096)), dtype=jnp.bfloat16)
w = jnp.asarray(rng.normal(size=(4096,)), dtype=jnp.bfloat16)
out = timed("rms_norm (1024,4096) bf16", lambda: rms_norm(x, w, 1e-6))
exp = rms_ref(x, w, 1e-6)
err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - exp.astype(jnp.float32))))
print("  rms_norm max err vs ref:", err)
assert err < 2e-2, err

# 2. fused add + gemma
res = jnp.asarray(rng.normal(size=(1024, 4096)), dtype=jnp.bfloat16)
o2, r2 = timed("fused_add_rms_norm", lambda: fused_add_rms_norm(x, res, w, 1e-6))
o3 = timed("gemma_rms_norm", lambda: gemma_rms_norm(x, w, 1e-6))

# 3. activations
xa = jnp.asarray(rng.normal(size=(1024, 2 * 14336)), dtype=jnp.bfloat16)
timed("silu_and_mul (1024,2*14336)", lambda: silu_and_mul(xa))
timed("gelu_tanh_and_mul", lambda: gelu_tanh_and_mul(xa))

# 4. rope
cache = compute_cos_sin_cache(500000.0, 128, 8192)
pos = jnp.asarray(rng.integers(0, 8192, size=(1024,)), dtype=jnp.int32)
q = jnp.asarray(rng.normal(size=(1024, 32 * 128)), dtype=jnp.bfloat16)
k = jnp.asarray(rng.normal(size=(1024, 8 * 128)), dtype=jnp.bfloat16)
qr, kr = timed("rotary_embedding 32q/8kv/128", lambda: rotary_embedding(pos, q, k, 128, cache))

# 5. static quant
xq = jnp.asarray(rng.normal(size=(1024, 4096)) * 20, dtype=jnp.bfloat16)
scale = jnp.asarray([0.3], dtype=jnp.float32)
qi, _ = timed("int8 static quant", lambda: scaled_int8_quant(xq, scale))
qf, _ = timed("fp8 static quant", lambda: scaled_fp8_quant(xq, scale))
print("  int8 sample:", np.asarray(qi[0, :4]), "fp8 sample:", np.asarray(qf[0, :4], dtype=np.float32))

# 6. bnb nf4 roundtrip on a Llama MLP-sized weight
wt = jnp.asarray(rng.normal(size=(4096 * 1024,)), dtype=jnp.bfloat16)
packed, state = quantize_4bit(wt, blocksize=64, quant_type="nf4", compress_statistics=True)
t0 = time.perf_counter()
packed, state0 = quantize_4bit(wt, blocksize=64, quant_type="nf4")
jax.block_until_ready(packed)
print(f"  nf4 quantize 4M elems: {(time.perf_counter()-t0)*1e3:.2f} ms, packed {packed.shape} {packed.dtype}")
restored = dequantize_4bit(packed, quant_state=state0)
err = float(jnp.max(jnp.abs(restored - wt.astype(restored.dtype))))
print("  nf4 roundtrip max err:", err)
assert err < 1.0

# 7. mixed precision GEMM int4
from conch_tpu.ops.quantization.gemm import mixed_precision_gemm
from conch_tpu.utils.quant_utils import quantize_weights, pack_rows
from conch_tpu.types import scalar_types

K, N, M = 4096, 4096, 128
wf = rng.normal(size=(K, N)).astype(np.float32) * 0.02
w_ref_d, w_q, w_s, _ = quantize_weights(wf, scalar_types.uint4b8, 128)
w_packed = jnp.asarray(pack_rows(w_q, 4))
xg = jnp.asarray(rng.normal(size=(M, K)), dtype=jnp.bfloat16)
out = timed(f"mixed_precision_gemm M{M} K{K} N{N} w4a16",
            lambda: mixed_precision_gemm(xg, w_packed, jnp.asarray(w_s, dtype=jnp.bfloat16), None, 4, 8, 128))
expected = np.asarray(xg, dtype=np.float32) @ w_ref_d
got = np.asarray(out, dtype=np.float32)
denom = np.abs(expected).mean()
print("  mixed gemm rel err:", np.abs(got - expected).max() / max(denom, 1e-9))

# 8. scaled GEMM int8
from conch_tpu.ops.quantization.gemm import scaled_gemm
a8 = jnp.asarray(rng.integers(-127, 127, size=(M, K)), dtype=jnp.int8)
b8 = jnp.asarray(rng.integers(-127, 127, size=(K, N)), dtype=jnp.int8)
sa = jnp.full((M,), 0.01, dtype=jnp.float32)
sb = jnp.full((N,), 0.02, dtype=jnp.float32)
out8 = timed("scaled_gemm int8", lambda: scaled_gemm(a8, b8, sa, sb, jnp.bfloat16))
exp8 = (np.asarray(a8, dtype=np.int64) @ np.asarray(b8, dtype=np.int64)).astype(np.float64) * 0.01 * 0.02
err8 = np.abs(np.asarray(out8, np.float64) - exp8).max() / np.abs(exp8).mean()
print("  scaled gemm rel err:", err8)

print("ALL DRIVES OK")
