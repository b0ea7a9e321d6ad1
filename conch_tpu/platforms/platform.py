# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Platform detection and capability queries.

TPU-native re-design of the reference's platform layer
(``conch/platforms/platform.py:13-87``): instead of NVIDIA/AMD SM-version
checks, we detect the TPU generation from the JAX device kind and expose the
capability bits that matter for kernel selection on TPU:

- native int8 MXU matmul support,
- native fp8 support (storage is always available via ml_dtypes bitcasts;
  *matmul* support depends on generation),
- VMEM size and minimum tile shape per dtype (for block-size tuning),
- whether we are running on a real TPU or interpreting Pallas on CPU.
"""

from __future__ import annotations

import enum
import functools
from dataclasses import dataclass


class PlatformEnum(enum.Enum):
    TPU = enum.auto()
    CPU = enum.auto()
    GPU = enum.auto()
    UNKNOWN = enum.auto()


class TpuGeneration(enum.Enum):
    UNKNOWN = 0
    V4 = 4
    V5E = 50
    V5P = 51
    V6E = 60
    V7 = 70


_DEVICE_KIND_TO_GENERATION = {
    "tpu v4": TpuGeneration.V4,
    "tpu v5 lite": TpuGeneration.V5E,
    "tpu v5e": TpuGeneration.V5E,
    "tpu v5": TpuGeneration.V5P,
    "tpu v5p": TpuGeneration.V5P,
    "tpu v6 lite": TpuGeneration.V6E,
    "tpu v6e": TpuGeneration.V6E,
    "tpu v7": TpuGeneration.V7,
}


@dataclass(frozen=True)
class Platform:
    """Capability descriptor for the current accelerator."""

    platform: PlatformEnum
    device_kind: str
    tpu_generation: TpuGeneration

    def is_tpu(self) -> bool:
        return self.platform == PlatformEnum.TPU

    def is_cpu(self) -> bool:
        return self.platform == PlatformEnum.CPU

    def supports_int8_matmul(self) -> bool:
        """Native int8 MXU matmuls (v5+ support int8; v4 upcasts)."""
        return self.is_tpu() and self.tpu_generation.value >= TpuGeneration.V5E.value

    def supports_fp8_matmul(self) -> bool:
        """Native fp8 MXU matmuls exist only on v6e+ (v5p/v5e dequantize in software)."""
        return self.is_tpu() and self.tpu_generation.value >= TpuGeneration.V6E.value

    def supports_fp8(self) -> bool:
        """fp8 *storage* (bitcast + software dequant) is always available."""
        return True

    def vmem_bytes(self) -> int:
        """Usable VMEM per core, for kernel block-size budgeting."""
        if self.tpu_generation in (TpuGeneration.V4, TpuGeneration.V5P):
            return 128 * 1024 * 1024 // 8  # 16 MB
        if self.tpu_generation in (TpuGeneration.V5E,):
            return 128 * 1024 * 1024 // 8  # 16 MB
        if self.tpu_generation in (TpuGeneration.V6E, TpuGeneration.V7):
            return 2 * 128 * 1024 * 1024 // 8  # 32 MB
        return 16 * 1024 * 1024

    def get_device_name(self) -> str:
        """Device name used to key per-device kernel tunings."""
        return self.device_kind

    @staticmethod
    def min_tile(dtype_name: str) -> tuple[int, int]:
        """Minimum (sublane, lane) tile for a dtype on TPU."""
        if dtype_name in ("float32", "int32", "uint32"):
            return (8, 128)
        if dtype_name in ("bfloat16", "float16"):
            return (16, 128)
        return (32, 128)  # int8 / fp8 / 8-bit types


def detect_current_platform() -> Platform:
    """Detect the current platform from the JAX default backend."""
    import jax

    try:
        device = jax.devices()[0]
    except RuntimeError:
        return Platform(PlatformEnum.UNKNOWN, "unknown", TpuGeneration.UNKNOWN)

    kind = device.device_kind.lower()
    platform_name = device.platform.lower()

    if "tpu" in kind or platform_name in ("tpu", "axon"):
        generation = TpuGeneration.UNKNOWN
        # Longest prefix match over known device kinds.
        for prefix in sorted(_DEVICE_KIND_TO_GENERATION, key=len, reverse=True):
            if kind.startswith(prefix):
                generation = _DEVICE_KIND_TO_GENERATION[prefix]
                break
        return Platform(PlatformEnum.TPU, device.device_kind, generation)

    if platform_name == "cpu":
        return Platform(PlatformEnum.CPU, device.device_kind, TpuGeneration.UNKNOWN)
    if platform_name in ("gpu", "cuda", "rocm"):
        return Platform(PlatformEnum.GPU, device.device_kind, TpuGeneration.UNKNOWN)
    return Platform(PlatformEnum.UNKNOWN, device.device_kind, TpuGeneration.UNKNOWN)


@functools.cache
def _cached_platform() -> Platform:
    return detect_current_platform()
