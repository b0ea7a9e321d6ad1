# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pipeline-parallel (GPipe schedule over the "pipe" mesh axis) tests.

Parity target: the pipelined loss/gradients must equal the single-device
``train.causal_lm_loss`` exactly (same microbatch-mean math), and the
train step must run and improve the loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding

from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.parallel.pipeline import (
    make_pp_loss_fn,
    make_pp_train_step,
    pp_param_pspecs,
    stage_params,
    unstage_params,
)
from conch_tpu.parallel.train import causal_lm_loss


STAGES = 4


@pytest.fixture(scope="module")
def cfg():
    return LlamaConfig(
        vocab_size=64,
        hidden_size=64,
        intermediate_size=128,
        num_layers=4,
        num_heads=4,
        num_kv_heads=2,
        head_dim=16,
        max_position=64,
    )


@pytest.fixture(scope="module")
def pipe_mesh():
    if len(jax.devices()) < STAGES:
        pytest.skip(f"needs {STAGES} devices")
    return Mesh(np.asarray(jax.devices()[:STAGES]).reshape(STAGES), ("pipe",))


def _place(staged, mesh):
    shardings = jax.tree.map(
        lambda spec: NamedSharding(mesh, spec), pp_param_pspecs(staged),
        is_leaf=lambda x: type(x).__name__ == "PartitionSpec",
    )
    return jax.device_put(staged, shardings)


def test_stage_unstage_roundtrip(cfg):
    params = init_llama_params(0, cfg)
    staged = stage_params(params, STAGES)
    back = unstage_params(staged)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_loss_matches_single_device(cfg, pipe_mesh):
    params = init_llama_params(0, cfg)
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, cfg.vocab_size, (8, 16)), jnp.int32)
    expected = float(causal_lm_loss(params, cfg, tokens))

    loss_fn = make_pp_loss_fn(pipe_mesh, cfg, num_microbatches=4)
    staged = _place(stage_params(params, STAGES), pipe_mesh)
    got = float(jax.jit(loss_fn)(staged, tokens))
    np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-5)


def test_pp_grads_match_single_device(cfg, pipe_mesh):
    params = init_llama_params(2, cfg)
    tokens = jnp.asarray(np.random.default_rng(3).integers(0, cfg.vocab_size, (8, 16)), jnp.int32)

    ref_grads = jax.grad(lambda p: causal_lm_loss(p, cfg, tokens))(params)

    loss_fn = make_pp_loss_fn(pipe_mesh, cfg, num_microbatches=4)
    staged = _place(stage_params(params, STAGES), pipe_mesh)
    pp_grads = jax.jit(jax.grad(loss_fn))(staged, tokens)
    pp_grads = unstage_params(pp_grads)

    ref_leaves, ref_tree = jax.tree_util.tree_flatten(ref_grads)
    pp_leaves, pp_tree = jax.tree_util.tree_flatten(pp_grads)
    assert ref_tree == pp_tree
    for r, p in zip(ref_leaves, pp_leaves):
        np.testing.assert_allclose(
            np.asarray(r, np.float32), np.asarray(p, np.float32), atol=2e-2, rtol=2e-2
        )


def test_pp_train_step_improves_loss(cfg, pipe_mesh):
    params = init_llama_params(4, cfg)
    tokens = jnp.asarray(np.random.default_rng(5).integers(0, cfg.vocab_size, (8, 16)), jnp.int32)

    step, init_opt, shardings = make_pp_train_step(pipe_mesh, cfg, params, num_microbatches=2)
    staged = jax.device_put(stage_params(params, STAGES), shardings)
    opt_state = init_opt(staged)

    losses = []
    for _ in range(4):
        staged, opt_state, loss = step(staged, opt_state, tokens)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]
