# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for mixed-precision and scaled GEMM ops.

Mirrors the reference's ``tests/mixed_precision_gemm_test.py`` and
``tests/scaled_gemm_test.py``: bit-width/group-size sweeps, zero-point
variants, K-scaled tolerances (``atol=min(5e-2*sqrt(K), 1), rtol=1e-1``).
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.quantization.gemm import mixed_precision_gemm, scaled_gemm
from conch_tpu.reference.quantization.gemm import (
    mixed_precision_gemm as mixed_ref,
    scaled_gemm as scaled_ref,
)
from conch_tpu.types import scalar_types
from conch_tpu.utils.quant_utils import pack_rows, quantize_weights

MNK_SHAPES = [(1, 256, 512), (16, 512, 256), (128, 1024, 512), (33, 384, 640)]


def _mixed_tolerance(k):
    return min(5e-2 * math.sqrt(k), 1.0)


@pytest.mark.parametrize("m,k,n", MNK_SHAPES)
@pytest.mark.parametrize("num_bits", [4, 8])
@pytest.mark.parametrize("group_size", [64, 128])
@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16])
def test_mixed_precision_gemm(m, k, n, num_bits, group_size, dtype, rng):
    quant_type = scalar_types.uint4b8 if num_bits == 4 else scalar_types.uint8b128
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.05

    _, w_q, w_s, _ = quantize_weights(w, quant_type, group_size)
    w_packed = jnp.asarray(pack_rows(w_q, num_bits))
    w_s_j = jnp.asarray(w_s, dtype=dtype)
    x = jnp.asarray(rng.normal(size=(m, k)), dtype=dtype)

    out = mixed_precision_gemm(x, w_packed, w_s_j, None, num_bits, quant_type.bias, group_size)
    expected = mixed_ref(x, np.asarray(w_packed), w_s_j, None, num_bits, quant_type.bias, group_size)

    assert out.shape == (m, n)
    assert out.dtype == dtype
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(expected, dtype=np.float32),
        atol=_mixed_tolerance(k),
        rtol=1e-1,
    )


@pytest.mark.parametrize("m,k,n", [(16, 512, 256), (64, 256, 384)])
def test_mixed_precision_gemm_with_zero_points(m, k, n, rng):
    group_size = 64
    w = (rng.normal(size=(k, n)).astype(np.float32) * 0.05) + 0.02  # asymmetric

    _, w_q, w_s, w_zp = quantize_weights(w, scalar_types.uint4, group_size, zero_points=True)
    w_packed = jnp.asarray(pack_rows(w_q, 4))
    w_s_j = jnp.asarray(w_s, dtype=jnp.bfloat16)
    w_zp_j = jnp.asarray(w_zp, dtype=jnp.float32)
    x = jnp.asarray(rng.normal(size=(m, k)), dtype=jnp.bfloat16)

    out = mixed_precision_gemm(x, w_packed, w_s_j, w_zp_j, 4, 0, group_size)
    expected = mixed_ref(x, np.asarray(w_packed), w_s_j, w_zp_j, 4, 0, group_size)

    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(expected, dtype=np.float32),
        atol=_mixed_tolerance(k),
        rtol=1e-1,
    )


def test_mixed_precision_gemm_vs_dense(rng):
    """End-to-end sanity: quantize -> gemm approximates the dense matmul."""
    m, k, n, group_size = 32, 1024, 256, 128
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.02
    w_ref_dense, w_q, w_s, _ = quantize_weights(w, scalar_types.uint4b8, group_size)
    w_packed = jnp.asarray(pack_rows(w_q, 4))
    x = jnp.asarray(rng.normal(size=(m, k)), dtype=jnp.bfloat16)

    out = mixed_precision_gemm(x, w_packed, jnp.asarray(w_s, dtype=jnp.bfloat16), None, 4, 8, group_size)
    dense = np.asarray(x, dtype=np.float32) @ w_ref_dense

    rel_err = np.abs(np.asarray(out, np.float32) - dense).max() / max(np.abs(dense).mean(), 1e-9)
    assert rel_err < 0.2, rel_err


@pytest.mark.parametrize("m,k,n", MNK_SHAPES)
@pytest.mark.parametrize("per_channel", [True, False])
def test_scaled_gemm_int8(m, k, n, per_channel, rng):
    a = jnp.asarray(rng.integers(-127, 128, size=(m, k)), dtype=jnp.int8)
    b = jnp.asarray(rng.integers(-127, 128, size=(k, n)), dtype=jnp.int8)
    if per_channel:
        scale_a = jnp.asarray(rng.uniform(0.001, 0.02, size=(m,)), dtype=jnp.float32)
        scale_b = jnp.asarray(rng.uniform(0.001, 0.02, size=(n,)), dtype=jnp.float32)
    else:
        scale_a = jnp.asarray([0.01], dtype=jnp.float32)
        scale_b = jnp.asarray([0.02], dtype=jnp.float32)

    out = scaled_gemm(a, b, scale_a, scale_b, jnp.bfloat16)
    expected = scaled_ref(a, b, scale_a, scale_b, jnp.bfloat16)

    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(expected, dtype=np.float32),
        atol=1e-1,
        rtol=1e-1,
    )


def test_scaled_gemm_int8_with_bias(rng):
    m, k, n = 16, 256, 128
    a = jnp.asarray(rng.integers(-64, 64, size=(m, k)), dtype=jnp.int8)
    b = jnp.asarray(rng.integers(-64, 64, size=(k, n)), dtype=jnp.int8)
    scale_a = jnp.asarray([0.01], dtype=jnp.float32)
    scale_b = jnp.asarray([0.02], dtype=jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n,)), dtype=jnp.float32)

    out = scaled_gemm(a, b, scale_a, scale_b, jnp.float32, bias=bias)
    expected = scaled_ref(a, b, scale_a, scale_b, jnp.float32, bias=bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), atol=1e-1, rtol=1e-1)


def test_scaled_gemm_fp8(rng):
    m, k, n = 16, 256, 128
    a = jnp.asarray(rng.normal(size=(m, k)), dtype=jnp.float8_e4m3fn)
    b = jnp.asarray(rng.normal(size=(k, n)), dtype=jnp.float8_e4m3fn)
    scale_a = jnp.asarray([0.5], dtype=jnp.float32)
    scale_b = jnp.asarray([2.0], dtype=jnp.float32)

    out = scaled_gemm(a, b, scale_a, scale_b, jnp.bfloat16)
    expected = scaled_ref(a, b, scale_a, scale_b, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(out, dtype=np.float32),
        np.asarray(expected, dtype=np.float32),
        atol=1.0,
        rtol=1e-1,
    )


def test_fused_nf4_gemm_matches_stored_codes():
    """QuantizedLinear('nf4').apply is a fused codebook GEMM: it must match
    an explicit numpy dequant (codes -> NF4 values -> * absmax) of its own
    stored arrays, without ever materializing the weight on the device."""
    from conch_tpu.kernels.quantization.bitsandbytes.blockwise import NF4_CODE
    from conch_tpu.models.linear import QuantizedLinear
    from conch_tpu.utils.quant_utils import unpack_rows

    rng = np.random.default_rng(9)
    k_dim, n_dim, m_dim, bs = 256, 384, 24, 64
    w = rng.normal(size=(k_dim, n_dim)).astype(np.float32) * 0.05
    lin = QuantizedLinear.nf4_from_dense(w, blocksize=bs)
    assert set(lin.arrays) == {"packed", "absmax"}
    assert lin.arrays["packed"].shape == (k_dim // 8, n_dim)
    assert lin.arrays["absmax"].shape == (k_dim // bs, n_dim)

    codes = unpack_rows(np.asarray(lin.arrays["packed"]), 4, k_dim)
    w_deq = np.asarray(NF4_CODE, np.float32)[codes] * np.repeat(
        np.asarray(lin.arrays["absmax"]), bs, axis=0
    )
    # The stored codes faithfully quantize w (sanity on the layout shuffle).
    assert np.abs(w_deq - w).max() < 0.2 * np.abs(w).max()

    x = rng.normal(size=(m_dim, k_dim)).astype(np.float32)
    out = np.asarray(lin.apply(jnp.asarray(x)))
    ref = x @ w_deq
    np.testing.assert_allclose(out, ref, rtol=2e-5, atol=2e-5)


def test_fused_nf4_gemm_bf16_activations():
    from conch_tpu.models.linear import QuantizedLinear

    rng = np.random.default_rng(10)
    w = rng.normal(size=(128, 256)).astype(np.float32) * 0.02
    lin = QuantizedLinear.nf4_from_dense(w, blocksize=64)
    x = jnp.asarray(rng.normal(size=(8, 128)), jnp.bfloat16)
    out = lin.apply(x)
    assert out.dtype == jnp.bfloat16
    ref = np.asarray(x, np.float32) @ w
    rel = np.abs(np.asarray(out, np.float32) - ref).max() / np.abs(ref).max()
    assert rel < 0.15  # nf4 quantization + bf16 rounding


def test_w8a8_linear_matches_dense():
    """QuantizedLinear('w8a8'): dynamic per-token int8 activations x
    per-channel int8 weights on the int8 MXU path vs the fp32 matmul."""
    from conch_tpu.models.linear import QuantizedLinear, quantize_linear

    rng = np.random.default_rng(11)
    w = rng.normal(size=(256, 512)).astype(np.float32) * 0.02
    lin = quantize_linear(w, "w8a8")
    assert lin.kind == "w8a8"
    assert lin.arrays["w8"].dtype == jnp.int8

    x = rng.normal(size=(16, 256)).astype(np.float32)
    out = np.asarray(lin.apply(jnp.asarray(x)))
    ref = x @ w
    rel = np.abs(out - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel  # two int8 roundings

    # bf16 activations keep the output dtype.
    out_bf = QuantizedLinear.w8a8_from_dense(w).apply(jnp.asarray(x, jnp.bfloat16))
    assert out_bf.dtype == jnp.bfloat16


def test_w8a8_tp_sharding_column_and_row():
    """w8a8 leaves shard correctly: (N,) out_scales follow N under
    column-parallel and replicate under row-parallel."""
    import jax
    from jax.sharding import PartitionSpec as P

    from conch_tpu.models.linear import quantize_linear
    from conch_tpu.parallel.sharding import llama_param_pspecs

    rng = np.random.default_rng(12)
    params = {
        "wq": quantize_linear(rng.normal(size=(64, 128)).astype(np.float32), "w8a8"),
        "wo": quantize_linear(rng.normal(size=(128, 64)).astype(np.float32), "w8a8"),
    }
    specs = llama_param_pspecs(params)
    assert specs["wq"].arrays["w8"] == P(None, "model")
    assert specs["wq"].arrays["out_scales"] == P("model")
    assert specs["wo"].arrays["w8"] == P("model", None)
    assert specs["wo"].arrays["out_scales"] == P()

    if len(jax.devices()) >= 4:
        from conch_tpu.parallel.mesh import create_mesh
        from conch_tpu.parallel.sharding import llama_param_shardings

        mesh = create_mesh(data=1, model=4)
        sharded = jax.device_put(params, llama_param_shardings(params, mesh))
        x = jnp.asarray(rng.normal(size=(8, 64)), jnp.float32)
        out = sharded["wq"].apply(x)  # GSPMD handles the sharded apply
        ref = params["wq"].apply(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize(("bits", "group_size"), [(4, 128), (4, 64), (8, 128), (8, 32)])
def test_mixed_gemm_planar_layout_matches_gptq(bits, group_size):
    """Planar-within-group packing + per-group-dot kernel computes the
    same GEMM as the GPTQ-layout kernel (the planar path applies scales
    post-dot in f32, so agreement is bounded by the gptq path's bf16
    weight rounding)."""
    from conch_tpu.utils.quant_utils import pack_rows_planar, unpack_rows_planar

    rng_ = np.random.default_rng(7)
    k_dim, n_dim = 512, 384
    qt = scalar_types.uint4b8 if bits == 4 else scalar_types.uint8b128
    w = rng_.normal(size=(k_dim, n_dim)).astype(np.float32) * 0.02
    _, w_q, w_s, _ = quantize_weights(w, qt, group_size)
    codes = np.asarray(w_q)
    planar = pack_rows_planar(codes, bits, group_size)
    assert (unpack_rows_planar(planar, bits, k_dim, group_size) == codes.astype(np.uint32)).all()

    x = jnp.asarray(rng_.normal(size=(16, k_dim)), dtype=jnp.bfloat16)
    scales = jnp.asarray(w_s, dtype=jnp.bfloat16)
    out_gptq = mixed_precision_gemm(
        x, jnp.asarray(pack_rows(codes, bits)), scales, None, bits, qt.bias, group_size
    )
    out_planar = mixed_precision_gemm(
        x, jnp.asarray(planar), scales, None, bits, qt.bias, group_size, layout="planar"
    )
    a, b = np.asarray(out_gptq, np.float32), np.asarray(out_planar, np.float32)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    assert rel < 0.02, rel


@pytest.mark.parametrize("group_size", [64, 128])
def test_mixed_gemm_magic_layout_matches_gptq(group_size):
    """Magic bf16-bitcast packing + zero-convert unpack kernel computes the
    same GEMM as the GPTQ-layout kernel. The kernel dots against 128+code
    and folds the 128 into the post-dot zero-point correction, so agreement
    is bounded by the gptq path's bf16 weight rounding."""
    from conch_tpu.utils.quant_utils import pack_rows_magic, unpack_rows_magic

    rng_ = np.random.default_rng(7)
    k_dim, n_dim = 512, 384
    qt = scalar_types.uint4b8
    w = rng_.normal(size=(k_dim, n_dim)).astype(np.float32) * 0.02
    _, w_q, w_s, _ = quantize_weights(w, qt, group_size)
    codes = np.asarray(w_q)
    magic = pack_rows_magic(codes, 4, group_size)
    assert (unpack_rows_magic(magic, k_dim, group_size) == codes.astype(np.uint32)).all()

    x = jnp.asarray(rng_.normal(size=(16, k_dim)), dtype=jnp.bfloat16)
    scales = jnp.asarray(w_s, dtype=jnp.bfloat16)
    out_gptq = mixed_precision_gemm(
        x, jnp.asarray(pack_rows(codes, 4)), scales, None, 4, qt.bias, group_size
    )
    out_magic = mixed_precision_gemm(
        x, jnp.asarray(magic), scales, None, 4, qt.bias, group_size, layout="magic"
    )
    a, b = np.asarray(out_gptq, np.float32), np.asarray(out_magic, np.float32)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    assert rel < 0.02, rel


def test_mixed_gemm_magic_rejects_unsupported():
    """Magic layout is 4-bit only with K % group == 0 and group % 8 == 0."""
    rng_ = np.random.default_rng(3)
    x = jnp.asarray(rng_.normal(size=(4, 256)), jnp.bfloat16)
    packed = jnp.zeros((64, 128), jnp.int32)
    scales = jnp.ones((2, 128), jnp.bfloat16)
    with pytest.raises(ValueError, match="magic"):
        # 8-bit weights are not supported by the bf16-bitcast unpack
        mixed_precision_gemm(x, packed, scales, None, 8, 128, 128, layout="magic")


def test_mixed_gemm_planar_rejects_unsupported():
    """Planar layout needs K % group == 0, group % pack == 0, no codebook."""
    rng_ = np.random.default_rng(3)
    x = jnp.asarray(rng_.normal(size=(4, 96)), jnp.bfloat16)
    packed = jnp.zeros((12, 128), jnp.int32)
    scales = jnp.ones((2, 128), jnp.bfloat16)
    with pytest.raises(ValueError, match="planar"):
        # group 12 not a multiple of the int4 pack factor (8)
        mixed_precision_gemm(x, packed, jnp.ones((8, 128), jnp.bfloat16), None, 4, 8, 12, layout="planar")


def test_quantized_linear_fast_layout_by_default():
    """QuantizedLinear picks the fastest layout the shape allows (magic for
    int4, planar for int8) and falls back to gptq otherwise; all compute
    x @ W."""
    from conch_tpu.models.linear import quantize_linear

    from conch_tpu.utils.quant_utils import unpack_rows_magic, unpack_rows_planar

    rng_ = np.random.default_rng(11)
    w = rng_.normal(size=(256, 128)).astype(np.float32) * 0.05
    x = jnp.asarray(rng_.normal(size=(8, 256)), jnp.bfloat16)
    for mode in ("int4", "int8"):
        lin = quantize_linear(w, mode)
        assert lin.meta["layout"] == ("magic" if mode == "int4" else "planar")
        out = np.asarray(lin.apply(x), np.float32)
        # Oracle: x @ dequant(codes) with the stored codes/scales.
        g = lin.meta["group_size"]
        if lin.meta["layout"] == "magic":
            codes = unpack_rows_magic(np.asarray(lin.arrays["packed"]), 256, g)
        else:
            codes = unpack_rows_planar(np.asarray(lin.arrays["packed"]), lin.meta["bits"], 256, g)
        deq = (codes.astype(np.float32) - lin.meta["bias"]) * np.repeat(
            np.asarray(lin.arrays["scales"], np.float32), g, axis=0
        )
        ref = np.asarray(x, np.float32) @ deq
        rel = np.abs(out - ref).max() / np.abs(ref).max()
        assert rel < 0.02, (mode, rel)
    # K=100 -> group 100 % pack 8 != 0 -> gptq fallback
    w_odd = rng_.normal(size=(96, 64)).astype(np.float32) * 0.05
    lin = quantize_linear(w_odd, "int4", group_size=96)
    # 96 % 8 == 0 so planar is fine; force a non-multiple instead
    lin2 = quantize_linear(w_odd, "int4", group_size=48)
    assert lin2.meta["layout"] in ("magic", "planar", "gptq")
    out2 = np.asarray(lin2.apply(jnp.asarray(rng_.normal(size=(4, 96)), jnp.bfloat16)))
    assert out2.shape == (4, 64)
