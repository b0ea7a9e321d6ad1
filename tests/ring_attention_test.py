# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Sequence-parallel ring attention vs dense attention oracle."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from conch_tpu.parallel.ring_attention import dense_attention_reference, make_ring_attention


@pytest.fixture(scope="module")
def seq_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("seq",))


@pytest.mark.parametrize("causal", [True, False])
def test_ring_attention_matches_dense(seq_mesh, causal):
    nrng = np.random.default_rng(11)
    b, s, h, d = 2, 64, 4, 32
    q = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    scale = 1 / math.sqrt(d)

    ring = make_ring_attention(seq_mesh, scale=scale, causal=causal)
    out = ring(q, k, v)
    exp = dense_attention_reference(q, k, v, scale=scale, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=2e-5, rtol=2e-5)


def test_ring_attention_bf16(seq_mesh):
    nrng = np.random.default_rng(12)
    b, s, h, d = 1, 128, 2, 64
    q = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.bfloat16)
    k = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.bfloat16)
    v = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.bfloat16)
    scale = 1 / math.sqrt(d)

    ring = make_ring_attention(seq_mesh, scale=scale)
    out = ring(q, k, v)
    exp = dense_attention_reference(q, k, v, scale=scale)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(exp, np.float32), atol=3e-2, rtol=3e-2
    )


def test_ring_attention_differentiable(seq_mesh):
    """The ring is scan+ppermute: grads must flow for training use."""
    nrng = np.random.default_rng(13)
    b, s, h, d = 1, 32, 2, 16
    q = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    scale = 1 / math.sqrt(d)

    ring = make_ring_attention(seq_mesh, scale=scale)
    g_ring = jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) ** 2), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(dense_attention_reference(q, k, v, scale=scale) ** 2),
        argnums=(0, 1, 2),
    )(q, k, v)
    for a, e in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(e), atol=1e-4, rtol=1e-4)


def test_ring_attention_gqa(seq_mesh):
    """GQA: 8 query heads, 4 KV heads (group of 2) over the 8-chip ring."""
    nrng = np.random.default_rng(14)
    b, s, hq, hkv, d = 1, 64, 8, 4, 16
    q = jnp.asarray(nrng.normal(size=(b, s, hq, d)), jnp.float32)
    k = jnp.asarray(nrng.normal(size=(b, s, hkv, d)), jnp.float32)
    v = jnp.asarray(nrng.normal(size=(b, s, hkv, d)), jnp.float32)
    scale = 1 / math.sqrt(d)

    ring = make_ring_attention(seq_mesh, scale=scale, causal=True)
    out = ring(q, k, v)
    k_rep = jnp.repeat(k, hq // hkv, axis=2)
    v_rep = jnp.repeat(v, hq // hkv, axis=2)
    exp = dense_attention_reference(q, k_rep, v_rep, scale=scale, causal=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=2e-5, rtol=2e-5)


def test_seq_parallel_train_matches_dense(seq_mesh):
    """Long-context training over the ring: loss and gradients equal the
    single-device dense-attention train math (full-context exactness)."""
    import jax

    from conch_tpu.models.llama import LlamaConfig, init_llama_params
    from conch_tpu.parallel.ring_attention import make_seq_parallel_train_step
    from conch_tpu.parallel.train import causal_lm_loss

    cfg = LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64, num_layers=2,
        num_heads=4, num_kv_heads=2, head_dim=8, max_position=256, dtype=jnp.float32,
    )
    params = init_llama_params(0, cfg, "bf16")
    nrng = np.random.default_rng(7)
    tokens = jnp.asarray(nrng.integers(0, 64, (2, 64)), jnp.int32)  # 8 tokens/shard

    step, init_opt, batch_sharding = make_seq_parallel_train_step(seq_mesh, cfg, params)

    # Loss parity (fresh params; step returns the pre-update loss).
    p1, _, loss_sp = step(params, init_opt(params), jax.device_put(tokens, batch_sharding))
    loss_dense = causal_lm_loss(init_llama_params(0, cfg, "bf16"), cfg, tokens)
    np.testing.assert_allclose(float(loss_sp), float(loss_dense), atol=2e-4, rtol=2e-4)

    # Gradient parity through one adamw update.
    params2 = init_llama_params(0, cfg, "bf16")
    dense_grads = jax.grad(lambda p: causal_lm_loss(p, cfg, tokens))(params2)
    from conch_tpu.parallel.ring_attention import _seq_parallel_loss_local  # noqa: F401
    import functools
    from jax.sharding import PartitionSpec as P

    loss_fn = jax.shard_map(
        functools.partial(_seq_parallel_loss_local, config=cfg, axis_name="seq"),
        mesh=seq_mesh, in_specs=(P(), P(None, "seq")), out_specs=P(), check_vma=False,
    )
    sp_grads = jax.grad(lambda p: loss_fn(p, tokens))(params2)
    flat_a = jax.tree.leaves(dense_grads)
    flat_b = jax.tree.leaves(sp_grads)
    for a, b in zip(flat_a, flat_b, strict=True):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=3e-4, rtol=3e-3
        )


def test_ring_attention_sliding_window(seq_mesh):
    """Window masking across ring shards matches the dense window oracle."""
    nrng = np.random.default_rng(21)
    b, s, h, d, W = 1, 64, 4, 16, 11
    q = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    k = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    v = jnp.asarray(nrng.normal(size=(b, s, h, d)), jnp.float32)
    scale = 1 / math.sqrt(d)

    out = make_ring_attention(seq_mesh, scale=scale, causal=True, window=W)(q, k, v)

    # Dense oracle with the banded mask.
    sref = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k)
    qpos = jnp.arange(s)
    mask = (qpos[None, :] <= qpos[:, None]) & (qpos[None, :] > qpos[:, None] - W)
    sref = jnp.where(mask[None, None], sref, -jnp.inf)
    exp = jnp.einsum("bhqk,bkhd->bqhd", jax.nn.softmax(sref, axis=-1), v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=2e-5, rtol=2e-5)
