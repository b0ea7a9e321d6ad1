"""Serve an int4 Llama through the engine on the real TPU."""
import time
import jax, jax.numpy as jnp, numpy as np
print("devices:", jax.devices())
from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams

cfg = LlamaConfig(
    vocab_size=32000, hidden_size=1024, intermediate_size=2816,
    num_layers=4, num_heads=8, num_kv_heads=2, head_dim=128, max_position=2048,
)
t0 = time.time()
params = init_llama_params(0, cfg, "int4", group_size=128)
print(f"init int4 params: {time.time()-t0:.1f}s")

eng = LLMEngine(params, cfg, EngineConfig(page_size=64, num_pages=256, max_batch_size=8, max_pages_per_seq=16, max_prefill_tokens=256))
rng = np.random.default_rng(0)
prompts = [rng.integers(0, 32000, size=n).tolist() for n in (12, 40, 7, 100)]
t0 = time.time()
outs = eng.generate(prompts, SamplingParams(max_tokens=16))
dt = time.time() - t0
total_tokens = sum(len(o) for o in outs)
print(f"generated {total_tokens} tokens in {dt:.1f}s (incl. compile)")
print("outputs lens:", [len(o) for o in outs], "| first:", outs[0][:8])

# second batch: no recompile, measure serving throughput
t0 = time.time()
outs2 = eng.generate([rng.integers(0, 32000, size=20).tolist() for _ in range(8)], SamplingParams(max_tokens=32))
dt2 = time.time() - t0
print(f"warm batch: {8*32} tokens in {dt2:.1f}s -> {8*32/dt2:.0f} tok/s")
assert all(len(o) == 32 for o in outs2)
print("ENGINE ON TPU OK")

# Speculative decoding on TPU: greedy-exact vs the regular path.
eng_spec = LLMEngine(params, cfg, EngineConfig(
    page_size=64, num_pages=256, max_batch_size=8, max_pages_per_seq=16,
    max_prefill_tokens=256, num_speculative_tokens=4,
))
motif = rng.integers(0, 32000, size=8).tolist()
spec_prompts = [motif * 3, motif * 2 + [5]]
t0 = time.time()
outs_spec = eng_spec.generate(spec_prompts, SamplingParams(max_tokens=24))
print(f"spec generate: {time.time()-t0:.1f}s; drafted {eng_spec.spec_tokens_drafted}, accepted {eng_spec.spec_tokens_accepted}")
eng_plain = LLMEngine(params, cfg, EngineConfig(
    page_size=64, num_pages=256, max_batch_size=8, max_pages_per_seq=16, max_prefill_tokens=256,
))
assert outs_spec == eng_plain.generate(spec_prompts, SamplingParams(max_tokens=24)), "SPEC MISMATCH"
print("SPEC ON TPU OK (greedy-exact)")
