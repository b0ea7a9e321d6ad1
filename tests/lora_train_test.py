# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""LoRA fine-tuning tests: adapter-only gradients over the frozen base,
GSPMD-sharded, with the standard zero-B init (delta starts at exactly
zero) and merged-weights parity after training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.models.linear import QuantizedLinear
from conch_tpu.models.llama import LlamaConfig, init_llama_params
from conch_tpu.models.lora import init_lora_adapter, merge_lora_into_params
from conch_tpu.parallel.train import causal_lm_loss, make_lora_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def _f32_dense(params: dict) -> dict:
    layers = dict(params["layers"])
    for name, ql in layers.items():
        if isinstance(ql, QuantizedLinear):
            layers[name] = QuantizedLinear.dense(ql.arrays["w"].astype(jnp.float32))
    out = dict(params)
    out["layers"] = layers
    out["lm_head"] = QuantizedLinear.dense(params["lm_head"].arrays["w"].astype(jnp.float32))
    return out


@pytest.fixture(scope="module")
def setup():
    cfg = LlamaConfig(
        vocab_size=64, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        max_position=128, dtype=jnp.float32,
    )
    params = _f32_dense(init_llama_params(0, cfg, "bf16"))
    # Markov-ish synthetic corpus: deterministic successor + noise.
    rng = np.random.default_rng(0)
    succ = rng.permutation(cfg.vocab_size)
    toks = [int(rng.integers(cfg.vocab_size))]
    for _ in range(4 * 32 - 1):
        toks.append(int(succ[toks[-1]]) if rng.random() < 0.9 else int(rng.integers(cfg.vocab_size)))
    batch = jnp.asarray(np.asarray(toks).reshape(4, 32), jnp.int32)
    return cfg, params, batch


def _mesh(shape):
    devs = np.array(jax.devices()[: shape[0] * shape[1]]).reshape(shape)
    return jax.sharding.Mesh(devs, ("data", "model"))


def test_zero_b_init_matches_base_loss(setup):
    cfg, params, batch = setup
    adapter = init_lora_adapter(
        1, cfg, rank=4, alpha=8.0, zero_b=True, dtype=jnp.float32,
        targets=("wq", "wv", "wo", "w_gate", "w_down"),
    )
    step, init_opt, _ = make_lora_train_step(_mesh((1, 1)), cfg, params, adapter)
    base = causal_lm_loss(params, cfg, batch)
    _, _, loss0 = step(params, adapter["layers"], init_opt(adapter["layers"]), batch)
    np.testing.assert_allclose(float(loss0), float(base), rtol=1e-6)


def test_lora_training_reduces_loss_and_freezes_base(setup):
    cfg, params, batch = setup
    adapter = init_lora_adapter(
        1, cfg, rank=8, alpha=16.0, zero_b=True, dtype=jnp.float32,
        targets=("wq", "wv", "wo", "w_gate", "w_down"),
    )
    step, init_opt, _ = make_lora_train_step(
        _mesh((2, 4)), cfg, params, adapter, learning_rate=3e-3, remat=True,
    )
    before = jax.tree.map(lambda x: np.asarray(x).copy(), params)
    ll, opt = adapter["layers"], init_opt(adapter["layers"])
    losses = []
    for _ in range(30):
        ll, opt, loss = step(params, ll, opt, batch)
        losses.append(float(loss))
    assert losses[-1] < 0.8 * losses[0], losses

    # Base params bit-identical (frozen by construction).
    for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(params)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # Serving-side parity: merging the trained adapter reproduces the
    # fine-tuned loss through the plain dense forward. (losses[-1] is the
    # pre-update loss of the last step; evaluate the final adapter fresh.)
    ll_host = jax.device_get(ll)
    final_loss = float(
        causal_lm_loss(params, cfg, batch, lora_layers=ll_host, lora_scale=adapter["scale"])
    )
    merged = merge_lora_into_params(params, {"layers": ll_host, "scale": adapter["scale"]})
    merged_loss = float(causal_lm_loss(merged, cfg, batch))
    np.testing.assert_allclose(merged_loss, final_loss, rtol=5e-4, atol=5e-4)


def test_lora_train_gspmd_matches_single_device(setup):
    cfg, params, batch = setup
    adapter = init_lora_adapter(
        2, cfg, rank=4, alpha=8.0, dtype=jnp.float32,
        targets=("wq", "wv", "wo", "w_gate", "w_down"),
    )

    def run(mesh_shape, steps=3):
        step, init_opt, _ = make_lora_train_step(_mesh(mesh_shape), cfg, params, adapter)
        # Fresh copies: the train step donates (and deletes) its inputs.
        ll = jax.tree.map(jnp.array, adapter["layers"])
        opt = init_opt(ll)
        out = []
        for _ in range(steps):
            ll, opt, loss = step(params, ll, opt, batch)
            out.append(float(loss))
        return out

    np.testing.assert_allclose(run((2, 4)), run((1, 1)), rtol=1e-5, atol=1e-6)
