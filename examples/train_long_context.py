# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Long-context training: sequence parallelism over a ring-attention mesh.

The context is sharded over every chip ("seq" axis) — no chip ever holds
the full sequence's activations — while ring attention rotates K/V blocks
so gradients are exact full-context gradients. Per-layer rematerialization
(on by default for this step) bounds activation memory at O(1) layers.
Checkpoints save shard-wise via orbax.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python examples/train_long_context.py
"""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.parallel.ring_attention import make_seq_parallel_train_step
from conch_tpu.utils.checkpoint import restore_sharded_checkpoint, save_sharded_checkpoint


def main() -> None:
    n = len(jax.devices())
    mesh = Mesh(np.asarray(jax.devices()).reshape(n), ("seq",))
    config = LlamaConfig(
        vocab_size=512, hidden_size=128, intermediate_size=256, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=32, max_position=4096,
    )
    params = init_llama_params(0, config, "bf16")

    # A context n x longer than one chip's shard; each chip sees seq/n.
    batch, seq = 2, 64 * n
    rng = np.random.default_rng(0)
    corpus = rng.integers(0, config.vocab_size, (8, batch, seq))

    step, init_opt, batch_sharding = make_seq_parallel_train_step(
        mesh, config, params, learning_rate=1e-3
    )
    opt_state = init_opt(params)
    for i, tokens in enumerate(corpus):
        tokens = jax.device_put(jnp.asarray(tokens, jnp.int32), batch_sharding)
        params, opt_state, loss = step(params, opt_state, tokens)
        print(f"step {i}: loss {float(loss):.4f} (ctx {seq} over {n} chips)")

    with tempfile.TemporaryDirectory() as d:
        save_sharded_checkpoint(f"{d}/ckpt", params)
        restored = restore_sharded_checkpoint(f"{d}/ckpt", jax.tree.map(jnp.zeros_like, params))
        ok = jax.tree.all(jax.tree.map(lambda a, b: bool(jnp.all(a == b)), params, restored))
        print(f"sharded checkpoint round-trip: {'ok' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
