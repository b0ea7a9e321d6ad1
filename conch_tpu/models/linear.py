# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Quantization-polymorphic linear layers.

The serving path treats every projection as a ``QuantizedLinear`` pytree
whose ``kind`` selects the matmul kernel:

- ``dense``: plain MXU matmul (bf16/f32 weights).
- ``int4``/``int8_grouped``: GPTQ-style packed weights + per-group scales
  -> ``mixed_precision_gemm`` (in-VMEM unpack + dequant before the dot).
- ``w8a8``: per-channel int8 weights + dynamic per-token int8
  activations -> ``scaled_gemm`` on the int8 MXU path (int32
  accumulation); the compute-bound (prefill) counterpart to the
  weight-only modes.
- ``nf4``: 4-bit NF4 codebook weights in GPTQ row layout with per-K-group
  absmax -> ``mixed_precision_gemm`` with the in-kernel 16-way codebook
  select (fused dequant; the dense (K, N) weight is never materialized).

This is the TPU materialization of the north-star "weight-only-quantized
Llama serving path" (BASELINE.json): weights stay packed in HBM and are
dequantized on the fly inside the GEMM kernels.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.kernels.quantization.bitsandbytes.blockwise import NF4_CODE
from conch_tpu.ops.quantization.bitsandbytes.functional import quantize_4bit
from conch_tpu.ops.quantization.gemm import mixed_precision_gemm, scaled_gemm
from conch_tpu.types.scalar_type import scalar_types
from conch_tpu.utils.quant_utils import (
    pack_rows,
    pack_rows_magic,
    pack_rows_planar,
    quantize_weights,
)


def padded_out_features(n: int) -> int:
    """Pad N so the GEMM gets a wide lane tile.

    The launcher picks block_n as the largest 128-multiple divisor of
    round_up(N, 128) up to 2048 (measured decode sweet spot). Shapes like
    Llama-3's 128256 vocab only admit bn=768 that way (196 GB/s measured
    vs 300-460 for the 2048-tiled projections on v5e) — padding N up to a
    2048 multiple at PACK time (+0.6%% bytes for the vocab case) buys the
    full-width tile without any per-call jnp.pad of the weight.

    N is ALWAYS rounded up to a 128 multiple: the stacked scalar-prefetch
    kernel refuses tile padding (it would copy the weight stack per
    call), so a non-128-multiple N (DeepSeek's w_kv_a at 576, tiny test
    shapes) would silently fall back to the slice-copy path — the exact
    2-7x bandwidth tax stacked mode exists to avoid.
    """
    from conch_tpu.kernels.common import round_up

    n128 = round_up(n, 128)
    best = max(d for d in range(128, min(n128, 2048) + 1, 128) if n128 % d == 0)
    if best >= 1024 or n <= 4096:
        return n128
    return round_up(n, 2048)


def _pack_grouped(w_q: np.ndarray, num_bits: int, group_size: int) -> tuple[np.ndarray, str]:
    """Fastest packing the shape allows: magic (4-bit bf16-bitcast unpack,
    733-792 Gel/s on v5e) > planar (per-group-dot, 601) > GPTQ rows."""
    epp = 32 // num_bits
    if num_bits == 4 and w_q.shape[0] % group_size == 0 and group_size % 8 == 0:
        return pack_rows_magic(w_q, num_bits, group_size), "magic"
    if w_q.shape[0] % group_size == 0 and group_size % epp == 0:
        return pack_rows_planar(w_q, num_bits, group_size), "planar"
    return pack_rows(w_q, num_bits), "gptq"


@jax.tree_util.register_pytree_with_keys_class
@dataclass
class QuantizedLinear:
    """A (K, N) projection in one of several storage formats."""

    kind: str  # "dense" | "int4" | "int8_grouped" | "nf4"
    arrays: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    def tree_flatten(self):
        keys = sorted(self.arrays.keys())
        return tuple(self.arrays[k] for k in keys), (self.kind, keys, tuple(sorted(self.meta.items())))

    def tree_flatten_with_keys(self):
        # Array names appear in tree paths (DictKey) so sharding rules can
        # dispatch on them (e.g. "packed" vs "absmax").
        keys = sorted(self.arrays.keys())
        keyed = tuple(
            (jax.tree_util.DictKey(k), self.arrays[k]) for k in keys
        )
        return keyed, (self.kind, keys, tuple(sorted(self.meta.items())))

    @classmethod
    def tree_unflatten(cls, aux, children):
        kind, keys, meta_items = aux
        return cls(kind=kind, arrays=dict(zip(keys, children)), meta=dict(meta_items))

    # -- constructors ------------------------------------------------------

    @staticmethod
    def dense(w: jax.Array) -> "QuantizedLinear":
        return QuantizedLinear("dense", {"w": w})

    @staticmethod
    def int4_from_dense(w: np.ndarray, group_size: int = 128, dtype=jnp.bfloat16) -> "QuantizedLinear":
        """GPTQ-style uint4b8 groupwise quantization of a (K, N) weight."""
        group_size = min(group_size, w.shape[0])  # small K: one group spans all of K
        w = np.asarray(w, dtype=np.float32)
        n = w.shape[1]
        n_pad = padded_out_features(n)
        if n_pad != n:
            w = np.pad(w, ((0, 0), (0, n_pad - n)))
        _, w_q, w_s, _ = quantize_weights(w, scalar_types.uint4b8, group_size)
        packed, layout = _pack_grouped(w_q, 4, group_size)
        meta = {"bits": 4, "bias": 8, "group_size": group_size, "layout": layout}
        if n_pad != n:
            meta["out_features"] = n
        return QuantizedLinear(
            "int4",
            {"packed": jnp.asarray(packed), "scales": jnp.asarray(w_s, dtype=dtype)},
            meta,
        )

    @staticmethod
    def int8_grouped_from_dense(w: np.ndarray, group_size: int = 128, dtype=jnp.bfloat16) -> "QuantizedLinear":
        group_size = min(group_size, w.shape[0])
        _, w_q, w_s, _ = quantize_weights(np.asarray(w, dtype=np.float32), scalar_types.uint8b128, group_size)
        packed, layout = _pack_grouped(w_q, 8, group_size)
        return QuantizedLinear(
            "int8_grouped",
            {"packed": jnp.asarray(packed), "scales": jnp.asarray(w_s, dtype=dtype)},
            {"bits": 8, "bias": 128, "group_size": group_size, "layout": layout},
        )

    @staticmethod
    def nf4_from_dense(w: np.ndarray, blocksize: int = 64, dtype=jnp.bfloat16) -> "QuantizedLinear":
        """NF4 blockwise quantization in GEMM-native K-grouped layout.

        Quantization blocks run along K per output column (same geometry as
        GPTQ groups), codes are bit-exact bitsandbytes NF4, and storage
        matches the int4 path — (K//8, N) int32 packed words + per-group
        (K//blocksize, N) absmax — so the fused mixed GEMM consumes it
        directly and TP sharding rules apply unchanged.
        """
        w = np.asarray(w, dtype=np.float32)
        k_dim, n_dim = w.shape
        if k_dim % blocksize != 0:
            msg = f"nf4 requires K ({k_dim}) divisible by blocksize ({blocksize})"
            raise ValueError(msg)
        # Encode column-major so each bitsandbytes block is one (column,
        # K-group) pair; reuses the validated NF4 encode path.
        packed_flat, state = quantize_4bit(
            jnp.asarray(w.T, dtype=dtype), blocksize=blocksize, quant_type="nf4"
        )
        bytes_flat = np.asarray(packed_flat).reshape(-1)
        codes = np.empty(bytes_flat.size * 2, dtype=np.uint8)
        codes[0::2] = bytes_flat >> 4  # even element in the high nibble
        codes[1::2] = bytes_flat & 0x0F
        codes_kn = codes.reshape(n_dim, k_dim).T  # (K, N)
        absmax = np.asarray(state.absmax, np.float32).reshape(n_dim, k_dim // blocksize).T
        return QuantizedLinear(
            "nf4",
            {
                "packed": jnp.asarray(pack_rows(codes_kn, 4)),
                "absmax": jnp.asarray(absmax),
            },
            {"shape": (k_dim, n_dim), "blocksize": blocksize, "dtype": str(jnp.dtype(dtype))},
        )

    @staticmethod
    def w8a8_from_dense(w: np.ndarray) -> "QuantizedLinear":
        """Per-output-channel symmetric int8 weight quantization (W8A8).

        Activations are quantized dynamically per token in :meth:`apply`;
        the matmul runs on the MXU's int8 path with int32 accumulation
        (reference scaled-GEMM frontend: conch/ops/quantization/gemm.py).
        """
        w = np.asarray(w, dtype=np.float32)
        scales = np.maximum(np.abs(w).max(axis=0) / 127.0, 1e-8)  # (N,)
        w8 = np.clip(np.rint(w / scales), -127, 127).astype(np.int8)
        return QuantizedLinear(
            "w8a8",
            {"w8": jnp.asarray(w8), "out_scales": jnp.asarray(scales, jnp.float32)},
            {},
        )

    # -- application -------------------------------------------------------

    def apply(self, x: jax.Array) -> jax.Array:
        """Compute ``x @ W`` for (tokens, K) activations."""
        if self.kind == "dense":
            return jnp.dot(x, self.arrays["w"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
        if self.kind in ("int4", "int8_grouped"):
            out = mixed_precision_gemm(
                x,
                self.arrays["packed"],
                self.arrays["scales"],
                None,
                self.meta["bits"],
                self.meta["bias"],
                self.meta["group_size"],
                layout=self.meta.get("layout", "gptq"),
            )
            n = self.meta.get("out_features")
            return out if n is None else out[:, :n]
        if self.kind == "nf4":
            return mixed_precision_gemm(
                x,
                self.arrays["packed"],
                self.arrays["absmax"],
                None,
                4,
                0,
                self.meta["blocksize"],
                codebook=tuple(float(v) for v in NF4_CODE),
            )
        if self.kind == "w8a8":
            xf = x.astype(jnp.float32)
            a_scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0  # (M,)
            xq = jnp.clip(jnp.rint(xf / a_scale[:, None]), -127, 127).astype(jnp.int8)
            return scaled_gemm(xq, self.arrays["w8"], a_scale, self.arrays["out_scales"], x.dtype)
        msg = f"Unknown linear kind: {self.kind}"
        raise ValueError(msg)

    @staticmethod
    def concat_n(qls: list["QuantizedLinear"]) -> "QuantizedLinear":
        """Concatenate projections along N: ``[x@W1 | x@W2 | ...]``.

        Every storage format keeps N as the LAST axis of every array
        (packed/scales/absmax are (…, K', N); all K-axis interleaving in
        the magic/planar layouts is per-column), so column concatenation
        of the packed arrays equals packing the column-concatenated dense
        weight. Used to fuse QKV and gate|up into single wide-N GEMMs:
        small-N decode GEMMs (N=1024) cannot amortize the dequant
        pipeline and measure 128-198 GB/s where wide-N tiles of the same
        kernel reach 750+ GB/s on v5e (exp_stacked_gemm_r4.log). Works on
        stacked (L, …) arrays unchanged.

        Raises ValueError when the pieces are not fusable (mixed kinds,
        mismatched quantization geometry, or pack-time N padding — padded
        columns would land mid-concat and corrupt the split points).
        """
        if not qls:
            raise ValueError("concat_n needs at least one projection")
        first = qls[0]
        if any(q.kind != first.kind for q in qls):
            raise ValueError("concat_n requires a single storage kind")
        if any(q.meta != first.meta for q in qls):
            raise ValueError("concat_n requires identical quantization metadata")
        if "out_features" in first.meta or "shape" in first.meta:
            raise ValueError("concat_n does not support pack-time-padded or shape-pinned projections")
        if first.kind == "w8a8":
            arrays = {
                "w8": jnp.concatenate([q.arrays["w8"] for q in qls], axis=-1),
                "out_scales": jnp.concatenate([q.arrays["out_scales"] for q in qls], axis=-1),
            }
            return QuantizedLinear("w8a8", arrays, dict(first.meta))
        arrays = {
            k: jnp.concatenate([q.arrays[k] for q in qls], axis=-1)
            for k in first.arrays
        }
        return QuantizedLinear(first.kind, arrays, dict(first.meta))

    def take_layer(self, layer_index: jax.Array) -> "QuantizedLinear":
        """Select one layer from stacked (L, ...) arrays (materializes the
        slice — use :meth:`apply_stacked` on the hot path)."""
        arrays = {
            k: jax.lax.dynamic_index_in_dim(v, layer_index, 0, keepdims=False)
            for k, v in self.arrays.items()
        }
        return QuantizedLinear(self.kind, arrays, self.meta)

    def apply_stacked(self, x: jax.Array, layer_index: jax.Array) -> jax.Array:
        """``x @ W[layer_index]`` for per-layer-stacked (L, ...) arrays.

        For the packed int formats the layer index rides the GEMM kernel's
        scalar prefetch, so the selected layer's tiles are DMA'd straight
        from the stacked HBM buffer. The alternative — slicing the stack in
        the layer scan — makes XLA materialize a copy of every weight
        before the opaque pallas_call: measured on v5e the same GEMM runs
        at 816.7 GB/s fed directly vs 109 GB/s as a scan slice
        (tools/drive/logs/exp_lmhead_r4b.log). Falls back to
        slice-then-apply for kinds/shapes the stacked kernel doesn't cover.
        """
        if self.kind in ("int4", "int8_grouped"):
            try:
                out = mixed_precision_gemm(
                    x,
                    self.arrays["packed"],
                    self.arrays["scales"],
                    None,
                    self.meta["bits"],
                    self.meta["bias"],
                    self.meta["group_size"],
                    layout=self.meta.get("layout", "gptq"),
                    layer_index=layer_index,
                )
            except ValueError:  # pad-free geometry unavailable for this shape
                return self.take_layer(layer_index).apply(x)
            n = self.meta.get("out_features")
            return out if n is None else out[:, :n]
        if self.kind == "nf4":
            try:
                return mixed_precision_gemm(
                    x,
                    self.arrays["packed"],
                    self.arrays["absmax"],
                    None,
                    4,
                    0,
                    self.meta["blocksize"],
                    codebook=tuple(float(v) for v in NF4_CODE),
                    layer_index=layer_index,
                )
            except ValueError:
                return self.take_layer(layer_index).apply(x)
        return self.take_layer(layer_index).apply(x)


def quantize_linear(w: np.ndarray, mode: str, **kwargs) -> QuantizedLinear:
    """Build a QuantizedLinear from a dense (K, N) weight by mode name."""
    if mode in ("bf16", "dense", "none"):
        return QuantizedLinear.dense(jnp.asarray(np.asarray(w), dtype=jnp.bfloat16))
    if mode == "int4":
        return QuantizedLinear.int4_from_dense(w, **kwargs)
    if mode == "int8":
        return QuantizedLinear.int8_grouped_from_dense(w, **kwargs)
    if mode == "nf4":
        return QuantizedLinear.nf4_from_dense(w, **kwargs)
    if mode == "w8a8":
        return QuantizedLinear.w8a8_from_dense(w, **kwargs)
    msg = f"Unknown quantization mode: {mode}"
    raise ValueError(msg)
