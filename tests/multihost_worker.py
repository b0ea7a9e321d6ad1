# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Worker process for the 2-process multi-host test (``multihost_test.py``).

Each worker is one "host": 4 virtual CPU devices (set via XLA_FLAGS by the
parent), joined through a real TCP coordinator by
``conch_tpu.parallel.distributed.initialize`` — the same bring-up path a
TPU pod uses (SURVEY.md §2.8), exercised across actual process boundaries.

Checks, in order (each prints an ``ok`` line the parent asserts on):

1. global device view: 2 processes x 4 local = 8 global devices
2. dp-across-hosts reduction: a global array sharded over the "data"
   (cross-process, DCN-like) axis reduced with a jitted sum
3. TP decode with the "model" axis spanning both processes (tp=8):
   logits must match a process-local single-device decode
4. sharded orbax checkpoint round-trip: every process writes only its
   own shards, restores onto the same mesh placement, and the restored
   decode reproduces (3)
"""

from __future__ import annotations

import sys


def main() -> None:
    pid, nprocs, port, ckpt_dir = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
        sys.argv[4],
    )

    import jax

    from conch_tpu.parallel.distributed import initialize

    initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    assert len(jax.local_devices()) == 4, jax.local_devices()
    assert len(jax.devices()) == 4 * nprocs, jax.devices()
    print(f"[worker {pid}] devices ok: {len(jax.devices())} global", flush=True)

    # --- 2) dp-across-hosts reduction over the cross-process axis ---------
    mesh = Mesh(np.asarray(jax.devices()).reshape(nprocs, 4), ("data", "model"))
    rows = np.arange(16 * 128, dtype=np.float32).reshape(16, 128)
    xsharding = NamedSharding(mesh, P("data", None))
    global_x = jax.make_array_from_callback(rows.shape, xsharding, lambda idx: rows[idx])
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(global_x)
    np.testing.assert_allclose(np.asarray(total), rows.sum(), rtol=1e-6)
    print(f"[worker {pid}] dp-across-hosts reduce ok", flush=True)

    # --- 3) TP decode spanning both processes (model axis = 8) ------------
    from conch_tpu.models.llama import (
        LlamaConfig,
        init_kv_caches,
        init_llama_params,
        llama_decode_step,
    )
    from conch_tpu.parallel.sharding import kv_cache_sharding, shard_llama_params
    from conch_tpu.parallel.tp_inference import make_tp_decode_step

    config = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=8, head_dim=32,
        max_position=256, dtype=jnp.float32,
    )
    params = init_llama_params(0, config, "bf16")  # deterministic: same on every host

    rng = np.random.default_rng(0)
    batch, num_pages, page_size = 4, 16, 16
    token_ids = jnp.asarray(rng.integers(0, config.vocab_size, batch), jnp.int32)
    positions = jnp.asarray([0, 2, 5, 1], jnp.int32)
    seq_lens = positions + 1
    block_tables = jnp.asarray(rng.permutation(num_pages).reshape(batch, 4), jnp.int32)
    slot_mapping = (
        block_tables[jnp.arange(batch), positions // page_size] * page_size
        + positions % page_size
    )

    # Process-local single-device baseline.
    k0, v0 = init_kv_caches(config, num_pages, page_size)
    ref_logits, _, _ = llama_decode_step(
        params, config, token_ids, positions, seq_lens, block_tables, slot_mapping, k0, v0
    )
    ref_logits = np.asarray(ref_logits)

    tp8 = Mesh(np.asarray(jax.devices()).reshape(1, 4 * nprocs), ("data", "model"))
    sharded = shard_llama_params(params, tp8)
    kc, vc = init_kv_caches(config, num_pages, page_size)
    kc = jax.device_put(kc, kv_cache_sharding(tp8))
    vc = jax.device_put(vc, kv_cache_sharding(tp8))
    step = make_tp_decode_step(tp8, config, sharded)
    tp_logits, kc, vc = step(
        sharded, token_ids, positions, seq_lens, block_tables, slot_mapping, kc, vc
    )
    # out_specs P("data") with data=1: every device holds the full logits.
    local_logits = np.asarray(tp_logits.addressable_data(0))
    np.testing.assert_allclose(local_logits, ref_logits, atol=2e-3, rtol=2e-3)
    print(f"[worker {pid}] tp8 cross-process decode ok", flush=True)

    # --- 4) sharded orbax checkpoint round-trip across processes ----------
    from conch_tpu.utils.checkpoint import (
        restore_sharded_checkpoint,
        save_sharded_checkpoint,
    )

    save_sharded_checkpoint(ckpt_dir, sharded)
    restored = restore_sharded_checkpoint(ckpt_dir, sharded)

    # Restored params must drive the same TP decode result.
    kc2, vc2 = init_kv_caches(config, num_pages, page_size)
    kc2 = jax.device_put(kc2, kv_cache_sharding(tp8))
    vc2 = jax.device_put(vc2, kv_cache_sharding(tp8))
    logits2, _, _ = step(
        restored, token_ids, positions, seq_lens, block_tables, slot_mapping, kc2, vc2
    )
    np.testing.assert_array_equal(
        np.asarray(logits2.addressable_data(0)), local_logits
    )
    print(f"[worker {pid}] sharded checkpoint round-trip ok", flush=True)

    jax.distributed.shutdown()
    print(f"[worker {pid}] ALL OK", flush=True)


if __name__ == "__main__":
    main()
