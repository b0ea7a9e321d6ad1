# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Torch-oracle tier: independently-written torch goldens, env-gated.

Parity with the reference's vendor-oracle tests (SURVEY §4.2: vLLM/bnb/
torchvision paths gated by ``CONCH_ENABLE_VLLM`` etc.). Here the oracle is
CPU torch: each golden below is written from the op's mathematical
definition in torch, independently of both the Pallas kernels and the jnp
reference layer, so agreement is a genuine three-way cross-check.

Run with: CONCH_ENABLE_TORCH=1 python -m pytest tests/torch_oracle_test.py
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu import envs

if not envs.CONCH_ENABLE_TORCH:
    pytest.skip("CONCH_ENABLE_TORCH=1 to enable torch oracle tests", allow_module_level=True)

import torch  # noqa: E402

from conch_tpu.ops.activation import gelu_tanh_and_mul, silu_and_mul  # noqa: E402
from conch_tpu.ops.embedding import rotary_embedding  # noqa: E402
from conch_tpu.ops.normalization import gemma_rms_norm, rms_norm  # noqa: E402
from conch_tpu.ops.quantization.int8 import scaled_int8_quant  # noqa: E402
from conch_tpu.reference.embedding.rotary_embedding import compute_cos_sin_cache  # noqa: E402

RNG = np.random.default_rng(42)


def to_t(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x, dtype=np.float32))


def test_rms_norm_vs_torch():
    x = RNG.normal(size=(64, 256)).astype(np.float32)
    w = RNG.normal(size=(256,)).astype(np.float32)
    eps = 1e-6
    xt = to_t(x)
    golden = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + eps) * to_t(w)
    ours = rms_norm(jnp.asarray(x), jnp.asarray(w), eps)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=2e-5, rtol=2e-5)


def test_gemma_rms_norm_vs_torch():
    x = RNG.normal(size=(64, 256)).astype(np.float32)
    w = RNG.normal(size=(256,)).astype(np.float32)
    eps = 1e-6
    xt = to_t(x)
    golden = xt * torch.rsqrt(xt.pow(2).mean(-1, keepdim=True) + eps) * (1.0 + to_t(w))
    ours = gemma_rms_norm(jnp.asarray(x), jnp.asarray(w), eps)
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=2e-5, rtol=2e-5)


def test_silu_and_mul_vs_torch():
    x = RNG.normal(size=(32, 512)).astype(np.float32)
    xt = to_t(x)
    golden = torch.nn.functional.silu(xt[:, :256]) * xt[:, 256:]
    ours = silu_and_mul(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=2e-5, rtol=2e-5)


def test_gelu_tanh_and_mul_vs_torch():
    x = RNG.normal(size=(32, 512)).astype(np.float32)
    xt = to_t(x)
    golden = torch.nn.functional.gelu(xt[:, :256], approximate="tanh") * xt[:, 256:]
    ours = gelu_tanh_and_mul(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(ours), golden.numpy(), atol=2e-5, rtol=2e-5)


def test_rotary_embedding_vs_torch():
    num_tokens, nq, nk, hd = 24, 4, 2, 64
    base = 10000.0
    q = RNG.normal(size=(num_tokens, nq * hd)).astype(np.float32)
    k = RNG.normal(size=(num_tokens, nk * hd)).astype(np.float32)
    positions = RNG.integers(0, 128, size=num_tokens)

    # Independent torch NeoX-style golden: rotate half, pairs (i, i+d/2).
    inv_freq = 1.0 / (base ** (torch.arange(0, hd, 2, dtype=torch.float32) / hd))
    t = torch.from_numpy(positions.astype(np.float32))
    freqs = torch.outer(t, inv_freq)  # (tokens, hd/2)
    cos, sin = freqs.cos(), freqs.sin()

    def rot(x: torch.Tensor, heads: int) -> torch.Tensor:
        xh = x.view(num_tokens, heads, hd)
        x1, x2 = xh[..., : hd // 2], xh[..., hd // 2 :]
        c, s = cos[:, None, :], sin[:, None, :]
        return torch.cat([x1 * c - x2 * s, x2 * c + x1 * s], dim=-1).view(num_tokens, heads * hd)

    cache = compute_cos_sin_cache(base, hd, 256)
    q_out, k_out = rotary_embedding(
        jnp.asarray(positions, jnp.int32), jnp.asarray(q), jnp.asarray(k), hd, cache
    )
    np.testing.assert_allclose(np.asarray(q_out), rot(to_t(q), nq).numpy(), atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(k_out), rot(to_t(k), nk).numpy(), atol=2e-5, rtol=2e-5)


def test_scaled_int8_quant_vs_torch():
    x = RNG.normal(size=(16, 128)).astype(np.float32) * 3
    scale = np.float32(0.05)
    golden = torch.clamp(torch.round(to_t(x) / scale), -128, 127).to(torch.int8)
    ours, _ = scaled_int8_quant(jnp.asarray(x), jnp.asarray([scale]))
    # Round-half-away vs round-half-even may differ at exact .5 boundaries.
    diff = np.abs(np.asarray(ours, np.int32) - golden.numpy().astype(np.int32))
    assert diff.max() <= 1


def test_attention_vs_torch_sdpa():
    """Dense decode attention vs torch scaled_dot_product_attention."""
    from conch_tpu.ops.attention import paged_attention

    batch, heads, kv_heads, hd, seq, page = 3, 8, 4, 64, 96, 16
    q = RNG.normal(size=(batch, heads, hd)).astype(np.float32)
    num_pages = batch * seq // page
    kc = RNG.normal(size=(num_pages, kv_heads, page, hd)).astype(np.float32)
    vc = RNG.normal(size=(num_pages, kv_heads, page, hd)).astype(np.float32)
    block_table = np.arange(num_pages, dtype=np.int32).reshape(batch, seq // page)
    seq_lens = np.asarray([seq, seq - 7, 33], dtype=np.int32)
    scale = 1.0 / math.sqrt(hd)

    out = paged_attention(
        jnp.asarray(q), jnp.asarray(kc), jnp.asarray(vc),
        jnp.asarray(block_table), jnp.asarray(seq_lens), scale=scale,
    )

    group = heads // kv_heads
    for b in range(batch):
        s = int(seq_lens[b])
        k = np.concatenate([kc[p].transpose(1, 0, 2) for p in block_table[b]], axis=0)[:s]
        v = np.concatenate([vc[p].transpose(1, 0, 2) for p in block_table[b]], axis=0)[:s]
        kt = to_t(k).repeat_interleave(group, dim=1).permute(1, 0, 2)  # (heads, s, hd)
        vt = to_t(v).repeat_interleave(group, dim=1).permute(1, 0, 2)
        qt = to_t(q[b])[:, None, :]  # (heads, 1, hd)
        golden = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt, scale=scale)
        np.testing.assert_allclose(
            np.asarray(out[b]), golden[:, 0, :].numpy(), atol=2e-4, rtol=2e-4
        )
