# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Stacked scalar-prefetch GEMM and fused-projection tests.

The stacked (L, ...) weight mode is the serving hot path (every decode
GEMM rides it — see ``QuantizedLinear.apply_stacked``); these tests pin
it at the kernel level instead of only incidentally through model tests:

- stacked-vs-per-layer parity for every packing layout (gptq / planar /
  magic) with and without zero-points, across BOTH meta-block delivery
  paths (``meta_direct`` raw blocks when groups-per-tile % 8 == 0, and
  the reshaped fallback — the round-4 layout-copy regression),
- the pad-free-geometry ``ValueError`` (stacked mode refuses tile
  padding: it would materialize a copy of the whole weight stack),
- the ``take_layer`` fallback in ``QuantizedLinear.apply_stacked``,
- ``QuantizedLinear.concat_n`` column-fusion parity (the QKV / gate|up
  fusion) and its rejection rules.

Parity model: mirrors the per-op discipline of the reference's
``tests/mixed_precision_gemm_test.py``.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.kernels.quantization.gemm import mixed_precision_gemm_launcher
from conch_tpu.models.linear import QuantizedLinear, quantize_linear
from conch_tpu.ops.quantization.gemm import mixed_precision_gemm
from conch_tpu.types import scalar_types
from conch_tpu.utils.quant_utils import (
    pack_rows,
    pack_rows_magic,
    pack_rows_planar,
    quantize_weights,
)

L, M, K, N, GROUP = 3, 8, 512, 256, 128


def _tol(k):
    return min(5e-2 * math.sqrt(k), 1.0)


def _make_stack(rng, layout, num_bits, zero_points=False):
    """Build (stacked arrays, per-layer arrays, dense weights)."""
    if zero_points:
        qt = scalar_types.uint4 if num_bits == 4 else scalar_types.uint8
        bias = 0
    else:
        qt = scalar_types.uint4b8 if num_bits == 4 else scalar_types.uint8b128
        bias = qt.bias
    packs = {"gptq": pack_rows, "planar": pack_rows_planar, "magic": pack_rows_magic}
    layers = []
    for _ in range(L):
        w = rng.normal(size=(K, N)).astype(np.float32) * 0.05 + (0.02 if zero_points else 0.0)
        _, w_q, w_s, w_zp = quantize_weights(w, qt, GROUP, zero_points=zero_points)
        if layout == "gptq":
            packed = packs[layout](w_q, num_bits)
        else:
            packed = packs[layout](w_q, num_bits, GROUP)
        layers.append(
            (
                jnp.asarray(packed),
                jnp.asarray(w_s, jnp.bfloat16),
                jnp.asarray(w_zp, jnp.float32) if zero_points else None,
            )
        )
    stacked = tuple(
        jnp.stack([layer[i] for layer in layers]) if layers[0][i] is not None else None
        for i in range(3)
    )
    return stacked, layers, bias


@pytest.mark.parametrize(
    "layout,num_bits",
    [("gptq", 4), ("gptq", 8), ("planar", 4), ("planar", 8), ("magic", 4)],
)
@pytest.mark.parametrize("zero_points", [False, True])
def test_stacked_matches_per_layer(rng, layout, num_bits, zero_points):
    if layout == "magic" and zero_points:
        pytest.skip("magic layout serves symmetric (uint4b8) weights")
    (sp, ss, sz), layers, bias = _make_stack(rng, layout, num_bits, zero_points)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    for i, (packed, w_s, w_zp) in enumerate(layers):
        per_layer = mixed_precision_gemm(
            x, packed, w_s, w_zp, num_bits, bias, GROUP, layout=layout
        )
        stacked = mixed_precision_gemm(
            x, sp, ss, sz, num_bits, bias, GROUP, layout=layout,
            layer_index=jnp.int32(i),
        )
        np.testing.assert_allclose(
            np.asarray(stacked, np.float32),
            np.asarray(per_layer, np.float32),
            atol=_tol(K),
            rtol=1e-1,
            err_msg=f"layer {i}",
        )


@pytest.mark.parametrize("block_k", [128, 256, 512])
def test_stacked_meta_paths(rng, block_k):
    """Both meta delivery paths agree: groups-per-tile = 1 (reshape path),
    2 (reshape path), 4 (direct when tile covers all groups)."""
    (sp, ss, _), layers, bias = _make_stack(rng, "magic", 4)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    per_layer = mixed_precision_gemm(x, *layers[1][:2], None, 4, bias, GROUP, layout="magic")
    out = mixed_precision_gemm_launcher(
        x, sp, ss, None,
        weight_size_bits=4, weight_bias=bias, group_size=GROUP, layout="magic",
        block_k=block_k, layer_index=jnp.int32(1),
    )
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(per_layer, np.float32),
        atol=_tol(K), rtol=1e-1,
    )


def test_stacked_rejects_padded_geometry(rng):
    """Stacked mode must refuse tile padding (it would copy the stack)."""
    n_odd = 136  # round_up(136, 128) = 256 != 136 -> padding required
    layers = []
    for _ in range(L):
        w = rng.normal(size=(K, n_odd)).astype(np.float32) * 0.05
        _, w_q, w_s, _ = quantize_weights(w, scalar_types.uint4b8, GROUP)
        layers.append((jnp.asarray(pack_rows(w_q, 4)), jnp.asarray(w_s, jnp.bfloat16)))
    sp = jnp.stack([p for p, _ in layers])
    ss = jnp.stack([s for _, s in layers])
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    with pytest.raises(ValueError, match="pad-free"):
        mixed_precision_gemm(x, sp, ss, None, 4, 8, GROUP, layer_index=jnp.int32(0))


def test_stacked_requires_layer_index(rng):
    (sp, ss, _), _, bias = _make_stack(rng, "gptq", 4)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    with pytest.raises(ValueError, match="layer_index"):
        mixed_precision_gemm(x, sp, ss, None, 4, bias, GROUP)


def _stack_linears(qls):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *qls)


def test_apply_stacked_parity_and_fallback(rng):
    """apply_stacked == slice-then-apply; pad-requiring shapes fall back
    to take_layer instead of erroring."""
    for n_dim in (N, 136):  # 136 trips the pad-free check -> fallback
        qls = [
            quantize_linear(rng.normal(size=(K, n_dim)).astype(np.float32) * 0.05, "int4")
            for _ in range(L)
        ]
        stacked = _stack_linears(qls)
        x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
        for i in range(L):
            got = stacked.apply_stacked(x, jnp.int32(i))
            want = qls[i].apply(x)
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32),
                atol=_tol(K), rtol=1e-1, err_msg=f"n={n_dim} layer {i}",
            )


@pytest.mark.parametrize("mode", ["int4", "int8", "bf16", "w8a8"])
def test_concat_n_matches_separate(rng, mode):
    """Fused [x@W1 | x@W2 | x@W3] == concatenated separate outputs."""
    ns = (N, 128, 384)
    ws = [rng.normal(size=(K, n)).astype(np.float32) * 0.05 for n in ns]
    qls = [quantize_linear(w, mode) for w in ws]
    fused = QuantizedLinear.concat_n(qls)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    got = np.asarray(fused.apply(x), np.float32)
    offset = 0
    for q, n in zip(qls, ns):
        want = np.asarray(q.apply(x), np.float32)
        np.testing.assert_allclose(
            got[:, offset : offset + n], want, atol=_tol(K), rtol=1e-1,
            err_msg=f"{mode} piece at {offset}",
        )
        offset += n


def test_concat_n_stacked_apply(rng):
    """concat_n on per-layer stacks feeds the stacked kernel (the fused
    QKV serving configuration: stack then fuse, select by layer index)."""
    per_layer = [
        [
            quantize_linear(rng.normal(size=(K, n)).astype(np.float32) * 0.05, "int4")
            for n in (N, 128)
        ]
        for _ in range(L)
    ]
    stacked_pieces = [
        _stack_linears([per_layer[l][j] for l in range(L)]) for j in range(2)
    ]
    fused = QuantizedLinear.concat_n(stacked_pieces)
    x = jnp.asarray(rng.normal(size=(M, K)), jnp.bfloat16)
    for i in range(L):
        got = np.asarray(fused.apply_stacked(x, jnp.int32(i)), np.float32)
        want = np.concatenate(
            [np.asarray(q.apply(x), np.float32) for q in per_layer[i]], axis=-1
        )
        np.testing.assert_allclose(got, want, atol=_tol(K), rtol=1e-1, err_msg=f"layer {i}")


def test_concat_n_rejections(rng):
    a = quantize_linear(rng.normal(size=(K, N)).astype(np.float32), "int4")
    b = quantize_linear(rng.normal(size=(K, N)).astype(np.float32), "int8")
    with pytest.raises(ValueError, match="single storage kind"):
        QuantizedLinear.concat_n([a, b])
    with pytest.raises(ValueError, match="at least one"):
        QuantizedLinear.concat_n([])
    # 4480 = 128*35 only admits bn=896 -> padded to 6144 at pack time;
    # padded columns would land mid-concat even when the metas agree.
    padded = [
        quantize_linear(rng.normal(size=(K, 4480)).astype(np.float32) * 0.05, "int4")
        for _ in range(2)
    ]
    assert all("out_features" in p.meta for p in padded)
    with pytest.raises(ValueError, match="padded"):
        QuantizedLinear.concat_n(padded)
    c = quantize_linear(rng.normal(size=(K, N)).astype(np.float32), "int4", group_size=64)
    with pytest.raises(ValueError, match="metadata"):
        QuantizedLinear.concat_n([a, c])


def test_fused_llama_params_parity(rng):
    """fuse_llama_params (engine default): fused-QKV/gate|up decode and
    prefill logits match the unfused model."""
    from conch_tpu.models.llama import (
        LlamaConfig,
        fuse_llama_params,
        init_kv_caches,
        init_llama_params,
        llama_decode_step,
        llama_prefill,
    )

    for quant in ("bf16", "int4"):
        cfg = LlamaConfig.tiny(vocab_size=64)
        params = init_llama_params(0, cfg, quant)
        fused = fuse_llama_params(params)
        assert "wqkv" in fused["layers"] and "wq" not in fused["layers"]
        assert "w_gateup" in fused["layers"] and "w_gate" not in fused["layers"]
        kc, vc = init_kv_caches(cfg, 16, 16)
        t = 8
        toks = jnp.asarray(rng.integers(0, 64, t), jnp.int32)
        pos = jnp.arange(t, dtype=jnp.int32)
        cu = jnp.asarray([0, t], jnp.int32)
        sl = jnp.asarray([t], jnp.int32)
        bt = jnp.asarray([[0, 1, 2, 3]], jnp.int32)
        lo1, kc1, vc1 = llama_prefill(params, cfg, toks, pos, cu, t, sl, bt, pos, kc, vc)
        lo2, kc2, vc2 = llama_prefill(fused, cfg, toks, pos, cu, t, sl, bt, pos, kc, vc)
        np.testing.assert_allclose(
            np.asarray(lo1), np.asarray(lo2), atol=2e-4, rtol=1e-4, err_msg=quant
        )
        t2 = jnp.asarray([3], jnp.int32)
        p2 = jnp.asarray([t], jnp.int32)
        d1, _, _ = llama_decode_step(
            params, cfg, t2, p2, p2 + 1, bt, p2, kc1, vc1
        )
        d2, _, _ = llama_decode_step(
            fused, cfg, t2, p2, p2 + 1, bt, p2, kc2, vc2
        )
        np.testing.assert_allclose(
            np.asarray(d1), np.asarray(d2), atol=2e-4, rtol=1e-4, err_msg=quant
        )
