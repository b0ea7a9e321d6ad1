# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""MoE layer + Mixtral model tests.

Parity strategy: the einsum-dispatch formulation (models/moe.py) is
checked exactly against a naive per-token loop oracle with capacity ==
num_tokens (no drops), then capacity-drop semantics, the full Mixtral
decode/prefill steps, and expert-parallel execution on the 8-CPU mesh
(both the shard_map engine path and the GSPMD einsum path).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.llama import LlamaConfig
from conch_tpu.models.moe import (
    MoEConfig,
    init_moe_kv_caches,
    init_moe_params,
    load_balance_loss,
    make_dispatch,
    mixtral_decode_step,
    mixtral_prefill,
    moe_ffn,
    moe_ffn_reference,
    route_topk,
)


@pytest.fixture
def nrng():
    return np.random.default_rng(3)


def _ffn_weights(nrng, e=4, h=32, f=64, dtype=jnp.float32):
    hidden = jnp.asarray(nrng.normal(size=(16, h)), dtype)
    router = jnp.asarray(nrng.normal(size=(h, e)), jnp.float32)
    wg = jnp.asarray(nrng.normal(size=(e, h, f)) * 0.1, dtype)
    wu = jnp.asarray(nrng.normal(size=(e, h, f)) * 0.1, dtype)
    wd = jnp.asarray(nrng.normal(size=(e, f, h)) * 0.1, dtype)
    return hidden, router, wg, wu, wd


def test_moe_ffn_matches_per_token_oracle(nrng):
    hidden, router, wg, wu, wd = _ffn_weights(nrng)
    out = moe_ffn(hidden, router, wg, wu, wd, top_k=2, capacity=hidden.shape[0])
    exp = moe_ffn_reference(hidden, router, wg, wu, wd, top_k=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=1e-5, rtol=1e-5)


def test_moe_ffn_top1_matches_oracle(nrng):
    hidden, router, wg, wu, wd = _ffn_weights(nrng, e=8)
    out = moe_ffn(hidden, router, wg, wu, wd, top_k=1, capacity=hidden.shape[0])
    exp = moe_ffn_reference(hidden, router, wg, wu, wd, top_k=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(exp), atol=1e-5, rtol=1e-5)


def test_dispatch_capacity_drops_overflow_tokens(nrng):
    # Route every token to expert 0 with capacity 2: tokens 2+ drop.
    t, e, cap = 5, 3, 2
    weights = jnp.ones((t, 1), jnp.float32)
    experts = jnp.zeros((t, 1), jnp.int32)
    dispatch, combine = make_dispatch(weights, experts, e, cap)
    d = np.asarray(dispatch)
    assert d.sum() == cap  # only two tokens admitted
    assert d[0, 0, 0] == 1 and d[1, 0, 1] == 1  # earlier tokens win
    assert np.asarray(combine)[2:].sum() == 0


def test_second_choice_queues_after_first_choices(nrng):
    # Token 0 picks expert 1 first; token 1 picks expert 1 second: the
    # slot ordering must give token 0's first choice position 0.
    weights = jnp.full((2, 2), 0.5, jnp.float32)
    experts = jnp.asarray([[1, 0], [0, 1]], jnp.int32)
    dispatch, _ = make_dispatch(weights, experts, 2, 2)
    d = np.asarray(dispatch)
    assert d[0, 1, 0] == 1  # token 0 -> expert 1, first position
    assert d[1, 1, 1] == 1  # token 1's second choice behind it


def test_route_topk_weights_normalized(nrng):
    logits = jnp.asarray(nrng.normal(size=(10, 8)), jnp.float32)
    w, idx = route_topk(logits, 2)
    np.testing.assert_allclose(np.asarray(w).sum(-1), 1.0, atol=1e-6)
    assert np.all(np.asarray(w)[:, 0] >= np.asarray(w)[:, 1])


def test_load_balance_loss_uniform_is_one(nrng):
    # Perfectly uniform routing gives loss == 1 (E * sum(1/E * 1/E) * E).
    e = 4
    logits = jnp.zeros((64, e), jnp.float32)
    experts = jnp.tile(jnp.arange(e, dtype=jnp.int32), 16)[:, None]
    loss = load_balance_loss(logits, experts, e)
    np.testing.assert_allclose(float(loss), 1.0, atol=1e-5)


def _tiny_cfg(model: int = 1) -> MoEConfig:
    return MoEConfig(
        llama=LlamaConfig(
            vocab_size=64,
            hidden_size=64,
            intermediate_size=128,
            num_layers=2,
            num_heads=2 * max(model, 1),
            num_kv_heads=max(model, 1),
            head_dim=32,
            max_position=128,
        ),
        num_experts=4,
        top_k=2,
        capacity_factor=4.0,  # no drops at tiny batch
    )


def _decode_inputs(nrng, cfg, batch=4, page_size=8, num_pages=16):
    k_caches, v_caches = init_moe_kv_caches(cfg, num_pages=num_pages, page_size=page_size)
    token_ids = jnp.asarray(nrng.integers(0, cfg.llama.vocab_size, batch), jnp.int32)
    positions = jnp.asarray(nrng.integers(0, page_size - 1, batch), jnp.int32)
    seq_lens = positions + 1
    block_tables = jnp.asarray(
        nrng.permutation(num_pages)[: batch * 2].reshape(batch, 2), jnp.int32
    )
    slot_mapping = block_tables[jnp.arange(batch), positions // page_size] * page_size + positions % page_size
    return token_ids, positions, seq_lens, block_tables, slot_mapping, k_caches, v_caches


def test_mixtral_decode_step_runs(nrng):
    cfg = _tiny_cfg()
    params = init_moe_params(0, cfg)
    inputs = _decode_inputs(nrng, cfg)
    logits, k_caches, v_caches = jax.jit(
        lambda *a: mixtral_decode_step(params, cfg, *a)
    )(*inputs)
    assert logits.shape == (4, cfg.llama.vocab_size)
    assert np.all(np.isfinite(np.asarray(logits)))
    assert np.asarray(k_caches).any()  # cache actually written


def test_mixtral_prefill_then_decode_consistent(nrng):
    """Prefill logits for a prompt == decode-step logits replaying it."""
    cfg = _tiny_cfg()
    params = init_moe_params(1, cfg)
    page_size, num_pages = 8, 16
    prompt = [5, 9, 2, 7]
    t = len(prompt)

    # Full prefill in one shot.
    k1, v1 = init_moe_kv_caches(cfg, num_pages=num_pages, page_size=page_size)
    bt = jnp.asarray([[0, 1]], jnp.int32)
    logits_pre, _, _ = mixtral_prefill(
        params, cfg,
        jnp.asarray(prompt, jnp.int32),
        jnp.arange(t, dtype=jnp.int32),
        jnp.asarray([0, t], jnp.int32), t,
        jnp.asarray([t], jnp.int32), bt,
        jnp.arange(t, dtype=jnp.int32),
        k1, v1,
    )

    # Prefill all but the last token, then decode it.
    k2, v2 = init_moe_kv_caches(cfg, num_pages=num_pages, page_size=page_size)
    _, k2, v2 = mixtral_prefill(
        params, cfg,
        jnp.asarray(prompt[:-1], jnp.int32),
        jnp.arange(t - 1, dtype=jnp.int32),
        jnp.asarray([0, t - 1], jnp.int32), t - 1,
        jnp.asarray([t - 1], jnp.int32), bt,
        jnp.arange(t - 1, dtype=jnp.int32),
        k2, v2,
    )
    logits_dec, _, _ = mixtral_decode_step(
        params, cfg,
        jnp.asarray([prompt[-1]], jnp.int32),
        jnp.asarray([t - 1], jnp.int32),
        jnp.asarray([t], jnp.int32), bt,
        jnp.asarray([t - 1], jnp.int32),
        k2, v2,
    )
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_dec), atol=2e-2, rtol=2e-2
    )


def test_moe_ffn_gspmd_expert_parallel_matches(nrng):
    """GSPMD path: expert weights sharded on the expert axis via jit."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    hidden, router, wg, wu, wd = _ffn_weights(nrng)
    expected = moe_ffn(hidden, router, wg, wu, wd, top_k=2, capacity=hidden.shape[0])

    mesh = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("expert",))
    shard = NamedSharding(mesh, P("expert", None, None))
    wg_s, wu_s, wd_s = (jax.device_put(w, shard) for w in (wg, wu, wd))
    out = jax.jit(
        lambda h, r, g, u, d: moe_ffn(h, r, g, u, d, top_k=2, capacity=h.shape[0])
    )(hidden, router, wg_s, wu_s, wd_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-5, rtol=1e-5)


def test_mixtral_tp_ep_decode_matches_single_device(nrng):
    """shard_map engine path: attention TP + expert parallelism on the
    same "model" axis must reproduce the single-device decode exactly."""
    from conch_tpu.parallel.mesh import create_mesh
    from conch_tpu.parallel.sharding import kv_cache_sharding, shard_llama_params
    from conch_tpu.parallel.tp_inference import make_tp_decode_step

    model = 4
    if len(jax.devices()) < model:
        pytest.skip("needs 4 virtual devices")
    cfg = _tiny_cfg(model=model)
    params = init_moe_params(2, cfg)
    inputs = _decode_inputs(nrng, cfg)

    ref_logits, ref_k, ref_v = mixtral_decode_step(params, cfg, *inputs)

    mesh = create_mesh(data=1, model=model)
    sharded = shard_llama_params(params, mesh)
    cache_shard = kv_cache_sharding(mesh)
    k_s = jax.device_put(inputs[-2], cache_shard)
    v_s = jax.device_put(inputs[-1], cache_shard)
    step = make_tp_decode_step(mesh, cfg, sharded, decode_fn=mixtral_decode_step)
    logits, k_out, v_out = step(sharded, *inputs[:-2], k_s, v_s)

    np.testing.assert_allclose(
        np.asarray(logits), np.asarray(ref_logits), atol=2e-2, rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(k_out, np.float32), np.asarray(ref_k, np.float32), atol=2e-2, rtol=2e-2
    )


def test_mixtral_served_by_engine(nrng):
    """The model-agnostic engine serves Mixtral, including prompt-lookup
    speculative decoding (greedy-exact vs the plain Mixtral engine)."""
    from conch_tpu.models.moe import mixtral_verify_forward
    from conch_tpu.serving import EngineConfig, LLMEngine, SamplingParams

    cfg = _tiny_cfg()
    params = init_moe_params(0, cfg)
    ecfg = dict(page_size=8, num_pages=64, max_batch_size=4, max_pages_per_seq=8)
    prompts = [[1, 2, 3, 1, 2, 3, 1, 2], [9, 8, 7, 6, 5]]

    plain = LLMEngine(
        params, cfg, EngineConfig(**ecfg),
        prefill_fn=mixtral_prefill, decode_fn=mixtral_decode_step,
    )
    outputs = plain.generate(prompts, SamplingParams(max_tokens=8))
    assert all(len(o) == 8 for o in outputs)

    spec = LLMEngine(
        params, cfg, EngineConfig(**ecfg, num_speculative_tokens=4),
        prefill_fn=mixtral_prefill, decode_fn=mixtral_decode_step,
        verify_fn=mixtral_verify_forward,
    )
    assert spec.generate(prompts, SamplingParams(max_tokens=8)) == outputs
    assert spec.spec_tokens_drafted > 0


def test_moe_train_step_gspmd(nrng):
    """GSPMD Mixtral training: sharded loss equals the unsharded forward,
    and a few adamw steps reduce it (experts sharded over "model")."""
    from conch_tpu.models.moe import make_moe_train_step, moe_dense_forward
    from conch_tpu.parallel.mesh import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = _tiny_cfg(model=2)  # 4 heads / 2 kv heads; 4 experts over model=4
    params = init_moe_params(1, cfg)
    tokens = jnp.asarray(nrng.integers(0, cfg.llama.vocab_size, (4, 16)), jnp.int32)

    logits, aux = moe_dense_forward(params, cfg, tokens)
    targets = tokens[:, 1:]
    lp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
    ref_loss = float(
        jnp.mean(-jnp.take_along_axis(lp, targets[..., None], axis=-1)[..., 0])
        + 0.01 * aux
    )

    mesh = create_mesh(data=2, model=4)
    step, init_opt, batch_sharding = make_moe_train_step(mesh, cfg, params)
    p, o, loss0 = step(params, init_opt(params), jax.device_put(tokens, batch_sharding))
    np.testing.assert_allclose(float(loss0), ref_loss, atol=2e-3, rtol=2e-3)
    for _ in range(3):
        p, o, loss = step(p, o, jax.device_put(tokens, batch_sharding))
    assert float(loss) < float(loss0)
