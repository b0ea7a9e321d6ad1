# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Train a small Llama on a mesh, then quantize it for serving.

Demonstrates the full loop: GSPMD data+tensor-parallel training ->
post-training quantization (``requantize_llama_params``) -> quantized
inference through the serving engine.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train_and_quantize.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.models.llama import LlamaConfig, init_llama_params, requantize_llama_params
from conch_tpu.parallel.mesh import create_mesh
from conch_tpu.parallel.train import make_train_step
from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams


def main() -> None:
    config = LlamaConfig(
        vocab_size=512, hidden_size=256, intermediate_size=512, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=64, max_position=128,
    )
    n = len(jax.devices())
    mesh = create_mesh(data=max(n // 4, 1), model=min(n, 4))
    print(f"mesh: {mesh.shape}")

    params = init_llama_params(0, config, "bf16")
    train_step, init_opt, param_shardings, batch_sharding = make_train_step(
        mesh, config, params, learning_rate=3e-3
    )
    params = jax.device_put(params, param_shardings)
    opt_state = init_opt(params)

    rng = np.random.default_rng(0)
    for step in range(20):
        batch = jax.device_put(
            jnp.asarray(rng.integers(0, config.vocab_size, size=(8, 64))), batch_sharding
        )
        params, opt_state, loss = train_step(params, opt_state, batch)
        if step % 5 == 0:
            print(f"step {step}: loss {float(loss):.4f}")

    print("quantizing to int4...")
    qparams = requantize_llama_params(params, config, "int4", group_size=64)
    engine = LLMEngine(qparams, config, EngineConfig(page_size=16, num_pages=128, max_batch_size=4, max_pages_per_seq=8))
    out = engine.generate([[1, 2, 3]], SamplingParams(max_tokens=8))[0]
    print(f"served {len(out)} tokens from the quantized model: {out}")


if __name__ == "__main__":
    main()
