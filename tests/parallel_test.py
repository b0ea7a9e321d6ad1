# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Multi-device sharding tests on the 8-device virtual CPU mesh.

Validates the TPU parallelism layers without TPU hardware (SURVEY.md §4):
tensor-parallel decode must agree numerically with the single-device
serving step, and the sharded training step must run and reduce loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.llama import LlamaConfig, init_kv_caches, init_llama_params, llama_decode_step
from conch_tpu.parallel.mesh import create_mesh
from conch_tpu.parallel.sharding import kv_cache_sharding, shard_llama_params
from conch_tpu.parallel.tp_inference import make_tp_decode_step
from conch_tpu.parallel.train import make_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def tp_model():
    config = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=256, dtype=jnp.float32,
    )
    params = init_llama_params(0, config, "bf16")
    return config, params


def test_tp_decode_matches_single_device(tp_model):
    """shard_map TP decode == single-device decode, bit-for-bit-ish."""
    config, params = tp_model
    mesh = create_mesh(data=2, model=4)
    rng = np.random.default_rng(0)

    batch = 4
    num_pages, page_size = 16, 16
    token_ids = jnp.asarray(rng.integers(0, config.vocab_size, batch), jnp.int32)
    positions = jnp.asarray([0, 2, 5, 1], jnp.int32)
    seq_lens = positions + 1
    block_tables = jnp.asarray(rng.permutation(num_pages).reshape(batch, 4), jnp.int32)
    slot_mapping = block_tables[jnp.arange(batch), positions // page_size] * page_size + positions % page_size

    # Single-device baseline (fresh caches).
    k0, v0 = init_kv_caches(config, num_pages, page_size)
    ref_logits, _, _ = llama_decode_step(
        params, config, token_ids, positions, seq_lens, block_tables, slot_mapping, k0, v0
    )

    # Tensor-parallel version.
    sharded = shard_llama_params(params, mesh)
    kc, vc = init_kv_caches(config, num_pages, page_size)
    kc = jax.device_put(kc, kv_cache_sharding(mesh))
    vc = jax.device_put(vc, kv_cache_sharding(mesh))
    step = make_tp_decode_step(mesh, config, sharded)
    tp_logits, kc, vc = step(sharded, token_ids, positions, seq_lens, block_tables, slot_mapping, kc, vc)

    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), atol=2e-3, rtol=2e-3
    )


def test_train_step_reduces_loss(tp_model):
    config, params = tp_model
    mesh = create_mesh(data=2, model=4)
    rng = np.random.default_rng(1)

    train_step, init_opt, param_shardings, batch_sharding = make_train_step(
        mesh, config, params, learning_rate=1e-2
    )
    # Copy before sharding: train_step donates its params, and device_put
    # can alias the module-scoped fixture's buffers when the sharding is
    # already satisfied (replicated leaves) — donation would delete them
    # for every later test in this module.
    params = jax.device_put(jax.tree.map(jnp.copy, params), param_shardings)
    opt_state = init_opt(params)
    tokens = jax.device_put(
        jnp.asarray(rng.integers(0, config.vocab_size, (4, 16)), jnp.int32), batch_sharding
    )

    losses = []
    for _ in range(5):
        params, opt_state, loss = train_step(params, opt_state, tokens)
        losses.append(float(loss))

    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses


def test_mesh_validation():
    with pytest.raises(ValueError, match="needs"):
        create_mesh(data=16, model=16)


def test_tp_decode_int4_matches_single_device():
    """TP decode with int4-quantized weights (packed words + scales sharded
    along the same logical axes) == single-device int4 decode — the
    north-star 70B-int4 tensor-sharded serving config, scaled down."""
    config = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=256, dtype=jnp.float32,
    )
    params = init_llama_params(0, config, "int4", group_size=32)
    mesh = create_mesh(data=1, model=4)
    rng = np.random.default_rng(3)

    batch, num_pages, page_size = 4, 16, 16
    token_ids = jnp.asarray(rng.integers(0, config.vocab_size, batch), jnp.int32)
    positions = jnp.asarray([0, 3, 1, 6], jnp.int32)
    seq_lens = positions + 1
    block_tables = jnp.asarray(rng.permutation(num_pages).reshape(batch, 4), jnp.int32)
    slot_mapping = block_tables[jnp.arange(batch), positions // page_size] * page_size + positions % page_size

    k0, v0 = init_kv_caches(config, num_pages, page_size)
    ref_logits, _, _ = llama_decode_step(
        params, config, token_ids, positions, seq_lens, block_tables, slot_mapping, k0, v0
    )

    sharded = shard_llama_params(params, mesh)
    kc, vc = init_kv_caches(config, num_pages, page_size)
    kc = jax.device_put(kc, kv_cache_sharding(mesh))
    vc = jax.device_put(vc, kv_cache_sharding(mesh))
    step = make_tp_decode_step(mesh, config, sharded)
    tp_logits, _, _ = step(sharded, token_ids, positions, seq_lens, block_tables, slot_mapping, kc, vc)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits), atol=3e-3, rtol=3e-3)


def test_tp_decode_int8_kv_cache():
    """TP decode with an int8 KV cache (quantize-on-store + folded dequant
    scales) stays close to the fp32-cache TP decode."""
    config = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=256, dtype=jnp.float32,
    )
    params = init_llama_params(0, config, "bf16")
    mesh = create_mesh(data=1, model=4)
    rng = np.random.default_rng(4)

    batch, num_pages, page_size = 4, 16, 16
    token_ids = jnp.asarray(rng.integers(0, config.vocab_size, batch), jnp.int32)
    positions = jnp.zeros(batch, jnp.int32)
    seq_lens = positions + 1
    block_tables = jnp.asarray(rng.permutation(num_pages).reshape(batch, 4), jnp.int32)
    slot_mapping = block_tables[jnp.arange(batch), 0] * page_size

    sharded = shard_llama_params(params, mesh)

    def run(cache_dtype):
        kc, vc = init_kv_caches(config, num_pages, page_size, cache_dtype=cache_dtype)
        kc = jax.device_put(kc, kv_cache_sharding(mesh))
        vc = jax.device_put(vc, kv_cache_sharding(mesh))
        step = make_tp_decode_step(mesh, config, sharded)
        logits, _, _ = step(sharded, token_ids, positions, seq_lens, block_tables, slot_mapping, kc, vc)
        return np.asarray(logits)

    ref = run(None)
    int8 = run(jnp.int8)
    np.testing.assert_allclose(int8, ref, atol=0.1, rtol=0.1)


def test_tp_decode_fp8_kv_cache():
    """TP decode with an fp8(e4m3) KV cache (north-star config: fp8 KV
    single-host serving) stays close to the fp32-cache TP decode."""
    config = LlamaConfig(
        vocab_size=256, hidden_size=128, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=256, dtype=jnp.float32, kv_cache_scale=0.01,
    )
    params = init_llama_params(0, config, "bf16")
    mesh = create_mesh(data=1, model=4)
    rng = np.random.default_rng(6)

    batch, num_pages, page_size = 4, 16, 16
    token_ids = jnp.asarray(rng.integers(0, config.vocab_size, batch), jnp.int32)
    positions = jnp.zeros(batch, jnp.int32)
    seq_lens = positions + 1
    block_tables = jnp.asarray(rng.permutation(num_pages).reshape(batch, 4), jnp.int32)
    slot_mapping = block_tables[jnp.arange(batch), 0] * page_size

    sharded = shard_llama_params(params, mesh)

    def run(cache_dtype):
        kc, vc = init_kv_caches(config, num_pages, page_size, cache_dtype=cache_dtype)
        kc = jax.device_put(kc, kv_cache_sharding(mesh))
        vc = jax.device_put(vc, kv_cache_sharding(mesh))
        step = make_tp_decode_step(mesh, config, sharded)
        logits, _, _ = step(sharded, token_ids, positions, seq_lens, block_tables, slot_mapping, kc, vc)
        return np.asarray(logits)

    ref = run(None)
    fp8 = run(jnp.float8_e4m3fn)
    np.testing.assert_allclose(fp8, ref, atol=0.1, rtol=0.1)


def test_tp_decode_nf4_matches_single_device():
    """TP decode with fused-NF4 weights: the K-grouped packed/absmax layout
    shards exactly like int4 (regression: nf4 used to be replicated and
    its flat layout could not shard at all)."""
    config = LlamaConfig(
        vocab_size=256, hidden_size=256, intermediate_size=256,
        num_layers=2, num_heads=8, num_kv_heads=4, head_dim=32,
        max_position=256, dtype=jnp.float32,
    )
    params = init_llama_params(0, config, "nf4", blocksize=64)
    mesh = create_mesh(data=1, model=4)
    rng = np.random.default_rng(7)

    batch, num_pages, page_size = 4, 16, 16
    token_ids = jnp.asarray(rng.integers(0, config.vocab_size, batch), jnp.int32)
    positions = jnp.asarray([0, 3, 1, 6], jnp.int32)
    seq_lens = positions + 1
    block_tables = jnp.asarray(rng.permutation(num_pages).reshape(batch, 4), jnp.int32)
    slot_mapping = block_tables[jnp.arange(batch), positions // page_size] * page_size + positions % page_size

    k0, v0 = init_kv_caches(config, num_pages, page_size)
    ref_logits, _, _ = llama_decode_step(
        params, config, token_ids, positions, seq_lens, block_tables, slot_mapping, k0, v0
    )

    sharded = shard_llama_params(params, mesh)
    kc, vc = init_kv_caches(config, num_pages, page_size)
    kc = jax.device_put(kc, kv_cache_sharding(mesh))
    vc = jax.device_put(vc, kv_cache_sharding(mesh))
    step = make_tp_decode_step(mesh, config, sharded)
    tp_logits, _, _ = step(sharded, token_ids, positions, seq_lens, block_tables, slot_mapping, kc, vc)

    np.testing.assert_allclose(np.asarray(tp_logits), np.asarray(ref_logits), atol=3e-3, rtol=3e-3)


def test_tp_prefill_matches_single_device(tp_model):
    """make_tp_prefill == single-device llama_prefill (VERDICT round-1 gap:
    the decode and train steps were parity-tested, prefill was not)."""
    from conch_tpu.models.llama import llama_prefill
    from conch_tpu.parallel.tp_inference import make_tp_prefill

    config, params = tp_model
    mesh = create_mesh(data=1, model=4)
    rng = np.random.default_rng(5)

    num_pages, page_size = 16, 16
    q_lens = [7, 12, 3]
    seq_lens_list = [7, 12, 3]  # pure prefill
    total = sum(q_lens)
    total_pad = 32
    max_q = 16
    batch = len(q_lens)

    token_ids = np.zeros(total_pad, np.int32)
    token_ids[:total] = rng.integers(0, config.vocab_size, total)
    positions = np.zeros(total_pad, np.int32)
    slots = np.full(total_pad, -1, np.int32)
    bt = rng.permutation(num_pages).reshape(4, 4).astype(np.int32)[:batch + 1][:batch]
    pos = 0
    for b, ql in enumerate(q_lens):
        positions[pos : pos + ql] = np.arange(ql)
        slots[pos : pos + ql] = bt[b, np.arange(ql) // page_size] * page_size + np.arange(ql) % page_size
        pos += ql
    cu = np.zeros(batch + 1, np.int32)
    cu[1:] = np.cumsum(q_lens)

    args = (
        jnp.asarray(token_ids), jnp.asarray(positions), jnp.asarray(cu),
    )
    sl = jnp.asarray(seq_lens_list, jnp.int32)
    btj = jnp.asarray(bt)
    slots_j = jnp.asarray(slots)

    k0, v0 = init_kv_caches(config, num_pages, page_size)
    ref_logits, _, _ = llama_prefill(
        params, config, args[0], args[1], args[2], max_q, sl, btj, slots_j, k0, v0
    )

    sharded = shard_llama_params(params, mesh)
    kc, vc = init_kv_caches(config, num_pages, page_size)
    kc = jax.device_put(kc, kv_cache_sharding(mesh))
    vc = jax.device_put(vc, kv_cache_sharding(mesh))
    step = make_tp_prefill(mesh, config, sharded, max_q)
    tp_logits, _, _ = step(sharded, args[0], args[1], args[2], sl, btj, slots_j, kc, vc)

    np.testing.assert_allclose(
        np.asarray(tp_logits), np.asarray(ref_logits), atol=2e-3, rtol=2e-3
    )


def test_train_step_remat_matches(tp_model):
    """jax.checkpoint per layer changes memory, not math: identical loss
    and gradients with and without remat."""
    import numpy as np

    from conch_tpu.models.llama import init_llama_params
    from conch_tpu.parallel.train import causal_lm_loss

    config, _ = tp_model
    params = init_llama_params(3, config, "bf16")
    rng = np.random.default_rng(9)
    tokens = jnp.asarray(rng.integers(0, config.vocab_size, (2, 32)), jnp.int32)

    plain = jax.value_and_grad(lambda p: causal_lm_loss(p, config, tokens))(params)
    remat = jax.value_and_grad(lambda p: causal_lm_loss(p, config, tokens, remat=True))(params)
    np.testing.assert_allclose(float(plain[0]), float(remat[0]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(plain[1]), jax.tree.leaves(remat[1]), strict=True):
        # Remat replays the layer forward, which XLA may fuse/reorder
        # differently from the saved-activation pass; individual bf16 grad
        # elements can shift ~1% (observed: 1/32768 elements at 0.78% rel).
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=1e-4, rtol=1e-2
        )
