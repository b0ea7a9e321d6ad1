# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Lazy ``current_platform`` singleton (mirrors reference ``conch/platforms/__init__.py:14-25``)."""

from typing import TYPE_CHECKING, Any

from conch_tpu.platforms.platform import (
    Platform,
    PlatformEnum,
    TpuGeneration,
    detect_current_platform,
)

if TYPE_CHECKING:
    current_platform: Platform

__all__ = [
    "Platform",
    "PlatformEnum",
    "TpuGeneration",
    "current_platform",
    "detect_current_platform",
]


def __getattr__(name: str) -> Any:
    if name == "current_platform":
        from conch_tpu.platforms.platform import _cached_platform

        return _cached_platform()
    msg = f"module {__name__!r} has no attribute {name!r}"
    raise AttributeError(msg)
