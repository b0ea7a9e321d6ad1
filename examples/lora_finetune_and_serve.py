# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""LoRA fine-tune -> multi-LoRA serve, end to end.

1. Train a rank-8 adapter (base frozen, zero-B init) on a synthetic
   Markov corpus with the GSPMD LoRA train step.
2. Serve base + adapter side by side in ONE continuous batch through the
   paged-KV engine (per-request ``lora_id``).
3. Check the adapter actually learned: it must reproduce the corpus's
   deterministic successor chain where the base model can't.

Run: JAX_PLATFORMS=cpu python examples/lora_finetune_and_serve.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.models.linear import QuantizedLinear
from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.models.lora import init_lora_adapter, stack_lora_adapters
from conch_tpu.parallel.train import make_lora_train_step
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


def main() -> None:
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position=256, dtype=jnp.float32,
    )
    params = init_llama_params(0, cfg, "bf16")
    layers = {
        n: QuantizedLinear.dense(q.arrays["w"].astype(jnp.float32))
        if isinstance(q, QuantizedLinear) else q
        for n, q in params["layers"].items()
    }
    params = {**params, "layers": layers,
              "lm_head": QuantizedLinear.dense(params["lm_head"].arrays["w"].astype(jnp.float32))}

    # Deterministic successor corpus: token t is always followed by succ[t].
    rng = np.random.default_rng(0)
    succ = rng.permutation(cfg.vocab_size)
    toks = [int(rng.integers(cfg.vocab_size))]
    for _ in range(8 * 64 - 1):
        toks.append(int(succ[toks[-1]]))
    batch = jnp.asarray(np.asarray(toks).reshape(8, 64), jnp.int32)

    adapter = init_lora_adapter(
        1, cfg, rank=8, alpha=16.0, zero_b=True, dtype=jnp.float32,
        targets=("wq", "wv", "wo", "w_gate", "w_down"),
    )
    n_dev = len(jax.devices())
    mesh_shape = (2, 4) if n_dev >= 8 else (1, 1)
    mesh = jax.sharding.Mesh(
        np.array(jax.devices()[: mesh_shape[0] * mesh_shape[1]]).reshape(mesh_shape),
        ("data", "model"),
    )
    step, init_opt, _ = make_lora_train_step(mesh, cfg, params, adapter, learning_rate=1e-2)
    ll, opt = adapter["layers"], init_opt(adapter["layers"])
    for i in range(120):
        ll, opt, loss = step(params, ll, opt, batch)
        if i % 30 == 0 or i == 119:
            print(f"step {i:3d}  lora-train loss {float(loss):.4f}")

    trained = {"layers": jax.device_get(ll), "scale": adapter["scale"]}
    stacked = stack_lora_adapters([trained])

    eng = LLMEngine(
        params, cfg,
        EngineConfig(page_size=16, num_pages=64, max_batch_size=4,
                     max_pages_per_seq=8, max_prefill_tokens=64),
        lora=stacked,
    )
    prompt = toks[:12]
    sp = SamplingParams(temperature=0.0, max_tokens=10)
    tuned, base = eng.generate([prompt, prompt], sp, lora_ids=[0, None])
    want = [int(succ[prompt[-1]])]
    for _ in range(9):
        want.append(int(succ[want[-1]]))
    print(f"prompt tail : {prompt[-4:]}")
    print(f"base model  : {base}")
    print(f"lora adapter: {tuned}")
    print(f"true chain  : {want}")
    hits = sum(a == b for a, b in zip(tuned, want))
    print(f"adapter continues the successor chain {hits}/10 "
          f"(base: {sum(a == b for a, b in zip(base, want))}/10)")
    assert hits >= 8, "adapter failed to learn the chain"
    print("OK")


if __name__ == "__main__":
    main()
