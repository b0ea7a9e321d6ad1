# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""bitsandbytes-compatible functional quantization API.

Parity with the reference
(``conch/ops/quantization/bitsandbytes/functional.py:84-269``): the
``QuantState`` container (including nested "double quantization" of the
absmax statistics), ``quantize_blockwise`` / ``quantize_4bit`` /
``dequantize_blockwise`` / ``dequantize_4bit``, the dynamic 8-bit code map
generator, and the same supported blocksizes/quant types. Arrays are JAX
arrays; tensors are returned (never mutated in place).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Final, Optional

import jax
import jax.numpy as jnp
import numpy as np

from conch_tpu.kernels.quantization.bitsandbytes.blockwise import (
    dequantize_blockwise_launcher,
    quantize_blockwise_launcher,
)

SUPPORTED_QUANT_TYPES: Final = ["nf4", "fp4", "fp8"]
SUPPORTED_BLOCKSIZES: Final = [4096, 2048, 1024, 512, 256, 128, 64]

_BYTES_PER_ELEMENT: Final = {
    jnp.dtype(jnp.float32): 4,
    jnp.dtype(jnp.float16): 2,
    jnp.dtype(jnp.bfloat16): 2,
    jnp.dtype(jnp.uint8): 1,
    jnp.dtype(jnp.int8): 1,
}

_NAME_TO_QMAP: dict[str, jax.Array] = {}


def create_dynamic_map(signed: bool = True, max_exponent_bits: int = 7, total_bits: int = 8) -> jax.Array:
    """Create the bitsandbytes dynamic 8-bit quantization code map.

    Dynamic exponent + linear fraction layout from "8-Bit Approximations for
    Parallelism in Deep Learning" (arXiv:1511.04561); mirrors the reference
    generator (``functional.py:31-81``) so code tables are bit-compatible.
    """
    data: list[float] = []
    non_sign_bits = total_bits - 1
    additional_items = 2 ** (non_sign_bits - max_exponent_bits) - 1
    for i in range(max_exponent_bits):
        fraction_items = int(
            2 ** (i + non_sign_bits - max_exponent_bits) + 1
            if signed
            else 2 ** (i + non_sign_bits - max_exponent_bits + 1) + 1
        )
        boundaries = np.linspace(0.1, 1.0, fraction_items, dtype=np.float32)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += ((10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()
        if signed:
            data += (-(10 ** (-(max_exponent_bits - 1) + i)) * means).tolist()

    if additional_items > 0:
        boundaries = np.linspace(0.1, 1.0, additional_items + 1, dtype=np.float32)
        means = (boundaries[:-1] + boundaries[1:]) / 2.0
        data += (max_exponent_bits * means).tolist()
        if signed:
            data += (-max_exponent_bits * means).tolist()

    data.append(0.0)
    data.append(1.0)

    assert len(data) == 2**total_bits

    data += [0.0] * (256 - len(data))
    data.sort()
    return jnp.asarray(np.array(data, dtype=np.float32))


@dataclass
class QuantState:
    """Quantization state (parity: reference ``functional.py:84-100``)."""

    absmax: jax.Array
    shape: tuple[int, ...]
    dtype: jnp.dtype
    blocksize: int
    quant_type: str
    code: jax.Array | None = None
    offset: float | None = None
    state2: Optional["QuantState"] = None

    @property
    def nested(self) -> bool:
        return self.state2 is not None


def get_absmax_shape(input_size: int, blocksize: int) -> tuple[int, ...]:
    """Shape of the per-block absmax tensor."""
    return (-(-input_size // blocksize),)


def get_quantized_output_shape(input_size: int, quant_type: str, quant_storage=jnp.uint8) -> tuple[int, ...]:
    """Shape of the packed quantized output (parity: reference ``functional.py:103-117``)."""
    if quant_type == "fp8":
        return (input_size,)
    mod = _BYTES_PER_ELEMENT[jnp.dtype(quant_storage)] * 2
    return ((input_size + 1) // mod, 1)


def quantize_blockwise(
    x: jax.Array,
    absmax: jax.Array | None = None,
    out: jax.Array | None = None,
    code: jax.Array | None = None,
    blocksize: int = 64,
    quant_type: str = "fp4",
    quant_storage=jnp.uint8,
) -> tuple[jax.Array, QuantState]:
    """Quantize input tensor in blocks; returns (packed, QuantState)."""
    if quant_type not in SUPPORTED_QUANT_TYPES:
        msg = f"Unsupported quant_type: {quant_type} ({SUPPORTED_QUANT_TYPES = })"
        raise NotImplementedError(msg)
    if blocksize not in SUPPORTED_BLOCKSIZES:
        msg = f"Unsupported blocksize: {blocksize} ({SUPPORTED_BLOCKSIZES = })"
        raise NotImplementedError(msg)
    if quant_type == "fp8" and code is None:
        msg = "8-bit quantization requires a code table"
        raise ValueError(msg)

    input_size = x.size
    packed, absmax_out = quantize_blockwise_launcher(x, code, blocksize, input_size, quant_type)

    expected_out_shape = get_quantized_output_shape(input_size, quant_type, quant_storage)
    packed = packed.reshape(expected_out_shape)
    assert absmax_out.shape == get_absmax_shape(input_size, blocksize)

    state = QuantState(
        absmax=absmax_out,
        shape=tuple(x.shape),
        dtype=x.dtype,
        blocksize=blocksize,
        quant_type=quant_type,
        code=code,
    )
    return packed, state


def quantize_4bit(
    x: jax.Array,
    absmax: jax.Array | None = None,
    out: jax.Array | None = None,
    blocksize: int = 64,
    compress_statistics: bool = False,
    quant_type: str = "fp4",
    quant_storage=jnp.uint8,
) -> tuple[jax.Array, QuantState]:
    """Quantize to packed 4-bit blocks, optionally double-quantizing absmax."""
    out, state = quantize_blockwise(
        x=x, absmax=absmax, out=out, code=None, blocksize=blocksize, quant_type=quant_type, quant_storage=quant_storage
    )

    if compress_statistics:
        absmax_vals = state.absmax
        offset = absmax_vals.mean()
        shifted = absmax_vals - offset
        if "dynamic" not in _NAME_TO_QMAP:
            _NAME_TO_QMAP["dynamic"] = create_dynamic_map()
        code = _NAME_TO_QMAP["dynamic"]
        qabsmax, state2 = quantize_blockwise(x=shifted, code=code, blocksize=256, quant_type="fp8")
        state = QuantState(
            absmax=qabsmax,
            shape=state.shape,
            dtype=state.dtype,
            blocksize=blocksize,
            code=None,
            quant_type=quant_type,
            offset=float(offset),
            state2=state2,
        )

    return out, state


def dequantize_blockwise(
    x: jax.Array,
    quant_state: QuantState | None = None,
    absmax: jax.Array | None = None,
    code: jax.Array | None = None,
    out: jax.Array | None = None,
    blocksize: int = 64,
    quant_type: str = "fp4",
) -> jax.Array:
    """Dequantize packed blocks back to a flat float tensor."""
    if quant_type not in SUPPORTED_QUANT_TYPES:
        msg = f"Unsupported quant_type: {quant_type} ({SUPPORTED_QUANT_TYPES = })"
        raise NotImplementedError(msg)
    if blocksize not in SUPPORTED_BLOCKSIZES:
        msg = f"Unsupported blocksize: {blocksize} ({SUPPORTED_BLOCKSIZES = })"
        raise NotImplementedError(msg)

    if quant_state is None:
        if absmax is None:
            msg = "Must pass either quant_state or absmax!"
            raise ValueError(msg)
        if code is None and quant_type == "fp8":
            msg = "Must pass either quant_state or code!"
            raise ValueError(msg)
        output_size = x.size * 2 if quant_type in ("nf4", "fp4") else x.size
        output_dtype = jnp.float32
    else:
        absmax = quant_state.absmax if absmax is None else absmax
        code = quant_state.code if code is None else code
        output_size = int(np.prod(quant_state.shape))
        output_dtype = quant_state.dtype
        blocksize = quant_state.blocksize
        quant_type = quant_state.quant_type

    return dequantize_blockwise_launcher(
        x, absmax, code, blocksize, output_size, quant_type, output_dtype=output_dtype
    )


def dequantize_4bit(
    x: jax.Array,
    quant_state: QuantState | None = None,
    absmax: jax.Array | None = None,
    out: jax.Array | None = None,
    blocksize: int = 64,
    quant_type: str = "fp4",
) -> jax.Array:
    """Dequantize packed 4-bit blocks, undoing nested absmax quantization."""
    if quant_state is not None and quant_state.nested:
        assert quant_state.state2 is not None
        assert quant_state.offset is not None
        absmax = dequantize_blockwise(
            x=quant_state.absmax,
            quant_state=quant_state.state2,
            blocksize=quant_state.state2.blocksize,
            quant_type=quant_state.state2.quant_type,
        )
        absmax = (absmax + quant_state.offset).astype(jnp.float32)
        # Use the flat (non-nested) path below with the recovered absmax.
        return dequantize_blockwise_launcher(
            x,
            absmax,
            None,
            quant_state.blocksize,
            int(np.prod(quant_state.shape)),
            quant_state.quant_type,
            output_dtype=quant_state.dtype,
        )

    return dequantize_blockwise(
        x=x, quant_state=quant_state, absmax=absmax, code=None, out=out, blocksize=blocksize, quant_type=quant_type
    )
