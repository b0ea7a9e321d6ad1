# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Sub-byte scalar type descriptors.

From-scratch equivalent of the vendored vLLM ``ScalarType``
(``conch/third_party/vllm/scalar_type.py``): describes quantized storage
formats that JAX dtypes cannot express — sub-byte integers with a bias
(GPTQ-style ``uint4b8``), and minifloat layouts — and computes their
representable min/max for quantization codecs.

The min/max computation here derives float limits from (exponent, mantissa,
nan-representation) arithmetic directly rather than via double bit-tricks.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class NanRepr(enum.Enum):
    """How NaNs are encoded in a minifloat format."""

    NONE = 0  # no NaN representation
    IEEE_754 = 1  # exp all-1s, mantissa != 0
    EXTD_RANGE_MAX_MIN = 2  # exp all-1s, mantissa all-1s is NaN (extends range)


@dataclass(frozen=True)
class ScalarType:
    """Descriptor for a (possibly sub-byte, possibly biased) scalar format.

    ``stored_value = value + bias``: e.g. GPTQ int4 stores values in
    [0, 15] with bias 8 representing [-8, 7].
    """

    exponent: int
    mantissa: int
    signed: bool
    bias: int
    finite_values_only: bool = False
    nan_repr: NanRepr = field(default=NanRepr.IEEE_754)

    @property
    def size_bits(self) -> int:
        return self.exponent + self.mantissa + int(self.signed)

    def is_floating_point(self) -> bool:
        return self.exponent != 0

    def is_integer(self) -> bool:
        return self.exponent == 0

    def is_signed(self) -> bool:
        return self.signed

    def has_bias(self) -> bool:
        return self.bias != 0

    def has_infs(self) -> bool:
        return not self.finite_values_only and self.nan_repr == NanRepr.IEEE_754

    def has_nans(self) -> bool:
        return self.nan_repr != NanRepr.NONE

    def _float_max(self) -> float:
        assert self.is_floating_point()
        max_mantissa = (1 << self.mantissa) - 1
        if self.nan_repr == NanRepr.EXTD_RANGE_MAX_MIN:
            max_mantissa -= 1  # all-1s mantissa at top exponent is NaN

        max_exponent = (1 << self.exponent) - 2
        if self.nan_repr in (NanRepr.EXTD_RANGE_MAX_MIN, NanRepr.NONE):
            max_exponent += 1  # top exponent encodes normal numbers

        exponent_bias = (1 << (self.exponent - 1)) - 1
        significand = 1.0 + max_mantissa / (1 << self.mantissa)
        return significand * 2.0 ** (max_exponent - exponent_bias)

    def max(self) -> int | float:
        """Largest representable value (before bias)."""
        if self.is_floating_point():
            return self._float_max()
        return (1 << self.mantissa) - 1 - self.bias

    def min(self) -> int | float:
        """Smallest representable value (before bias)."""
        if self.is_floating_point():
            assert self.is_signed()
            return -self._float_max()
        if self.is_signed():
            return -(1 << (self.size_bits - 1)) - self.bias
        return -self.bias

    def __str__(self) -> str:
        if self.is_floating_point():
            name = f"float{self.size_bits}_e{self.exponent}m{self.mantissa}"
            if self.finite_values_only:
                name += "f"
            if self.nan_repr != NanRepr.NONE:
                name += "n"
            return name
        name = f"{'' if self.signed else 'u'}int{self.size_bits}"
        if self.bias:
            name += f"b{self.bias}"
        return name

    # -- constructors ------------------------------------------------------

    @classmethod
    def int_(cls, size_bits: int, bias: int | None = None) -> ScalarType:
        return cls(0, size_bits - 1, True, bias or 0)

    @classmethod
    def uint(cls, size_bits: int, bias: int | None = None) -> ScalarType:
        return cls(0, size_bits, False, bias or 0)

    @classmethod
    def float_IEEE754(cls, exponent: int, mantissa: int) -> ScalarType:
        return cls(exponent, mantissa, True, 0)

    @classmethod
    def float_(cls, exponent: int, mantissa: int, finite_values_only: bool, nan_repr: NanRepr) -> ScalarType:
        return cls(exponent, mantissa, True, 0, finite_values_only, nan_repr)


class scalar_types:  # noqa: N801 - parity with reference naming
    """Canonical instances (parity: reference ``scalar_type.py:299-322``)."""

    int4 = ScalarType.int_(4)
    uint4 = ScalarType.uint(4)
    int8 = ScalarType.int_(8)
    uint8 = ScalarType.uint(8)
    float8_e4m3fn = ScalarType.float_(4, 3, True, NanRepr.EXTD_RANGE_MAX_MIN)
    float8_e5m2 = ScalarType.float_IEEE754(5, 2)
    float16_e8m7 = ScalarType.float_IEEE754(8, 7)
    float16_e5m10 = ScalarType.float_IEEE754(5, 10)
    float6_e3m2f = ScalarType.float_(3, 2, True, NanRepr.NONE)
    float4_e2m1fn = ScalarType.float_(2, 1, True, NanRepr.NONE)

    # GPTQ-style biased uints
    uint2b2 = ScalarType.uint(2, 2)
    uint3b4 = ScalarType.uint(3, 4)
    uint4b8 = ScalarType.uint(4, 8)
    uint8b128 = ScalarType.uint(8, 128)

    bfloat16 = float16_e8m7
    float16 = float16_e5m10
