# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Quantization-polymorphic linear layers.

The serving path treats every projection as a ``QuantizedLinear`` pytree
whose ``kind`` selects the matmul kernel:

- ``dense``: plain MXU matmul (bf16/f32 weights).
- ``int4``/``int8_grouped``: GPTQ-style packed weights + per-group scales
  -> ``mixed_precision_gemm`` (in-VMEM unpack + dequant before the dot).
- ``int8``: per-channel scaled int8 weights -> ``scaled_gemm`` with
  dynamic per-token activation quantization.
- ``nf4``: bitsandbytes 4-bit blockwise -> dequantize + dense matmul.

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

from conch_tpu.ops.quantization.bitsandbytes.functional import QuantState, dequantize_4bit, quantize_4bit
from conch_tpu.ops.quantization.gemm import mixed_precision_gemm
from conch_tpu.types.scalar_type import scalar_types
from conch_tpu.utils.quant_utils import pack_rows, quantize_weights


@jax.tree_util.register_pytree_node_class
@dataclass
class QuantizedLinear:
    """A (K, N) projection in one of several storage formats."""

    kind: str  # "dense" | "int4" | "int8_grouped" | "nf4"
    arrays: dict[str, Any] = field(default_factory=dict)
    meta: dict[str, Any] = field(default_factory=dict)

    def tree_flatten(self):
        keys = sorted(self.arrays.keys())
        return tuple(self.arrays[k] for k in keys), (self.kind, keys, tuple(sorted(self.meta.items())))

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
        _, w_q, w_s, _ = quantize_weights(np.asarray(w, dtype=np.float32), scalar_types.uint4b8, group_size)
        return QuantizedLinear(
            "int4",
            {"packed": jnp.asarray(pack_rows(w_q, 4)), "scales": jnp.asarray(w_s, dtype=dtype)},
            {"bits": 4, "bias": 8, "group_size": group_size},
        )

    @staticmethod
    def int8_grouped_from_dense(w: np.ndarray, group_size: int = 128, dtype=jnp.bfloat16) -> "QuantizedLinear":
        _, w_q, w_s, _ = quantize_weights(np.asarray(w, dtype=np.float32), scalar_types.uint8b128, group_size)
        return QuantizedLinear(
            "int8_grouped",
            {"packed": jnp.asarray(pack_rows(w_q, 8)), "scales": jnp.asarray(w_s, dtype=dtype)},
            {"bits": 8, "bias": 128, "group_size": group_size},
        )

    @staticmethod
    def nf4_from_dense(w: np.ndarray, blocksize: int = 64, dtype=jnp.bfloat16) -> "QuantizedLinear":
        packed, state = quantize_4bit(jnp.asarray(w, dtype=dtype), blocksize=blocksize, quant_type="nf4")
        # nf4 storage is flat over the whole tensor (bitsandbytes layout):
        # distinct array names so sharding rules can replicate it.
        return QuantizedLinear(
            "nf4",
            {"nf4_packed": packed, "absmax": state.absmax},
            {"shape": tuple(w.shape), "blocksize": blocksize, "dtype": str(jnp.dtype(dtype))},
        )

    # -- application -------------------------------------------------------

    def apply(self, x: jax.Array) -> jax.Array:
        """Compute ``x @ W`` for (tokens, K) activations."""
        if self.kind == "dense":
            return jnp.dot(x, self.arrays["w"].astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
        if self.kind in ("int4", "int8_grouped"):
            return mixed_precision_gemm(
                x,
                self.arrays["packed"],
                self.arrays["scales"],
                None,
                self.meta["bits"],
                self.meta["bias"],
                self.meta["group_size"],
            )
        if self.kind == "nf4":
            shape = self.meta["shape"]
            state = QuantState(
                absmax=self.arrays["absmax"],
                shape=shape,
                dtype=jnp.dtype(self.meta["dtype"]),
                blocksize=self.meta["blocksize"],
                quant_type="nf4",
            )
            w = dequantize_4bit(self.arrays["nf4_packed"], quant_state=state).reshape(shape)
            return jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
        msg = f"Unknown linear kind: {self.kind}"
        raise ValueError(msg)


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
    msg = f"Unknown quantization mode: {mode}"
    raise ValueError(msg)
