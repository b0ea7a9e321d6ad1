# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Lazy environment-variable flag system.

TPU-native equivalent of the reference's ``conch/envs.py:16-39``: a module
whose attributes are env-var flags, evaluated lazily on attribute access so
that flipping the environment between imports is honored.
"""

import os
from collections.abc import Callable
from typing import Any

environment_variables: dict[str, Callable[[], Any]] = {
    # Enable the native C++ extension (host-side baselines / runtime helpers).
    "CONCH_ENABLE_CPP_EXT": lambda: bool(int(os.getenv("CONCH_ENABLE_CPP_EXT", "0"))),
    # Enable torch-based cross-checking reference paths in tests/benchmarks.
    "CONCH_ENABLE_TORCH": lambda: bool(int(os.getenv("CONCH_ENABLE_TORCH", "0"))),
    # Run every available reference implementation in benchmarks.
    "CONCH_BENCH_ENABLE_ALL_REF": lambda: bool(int(os.getenv("CONCH_BENCH_ENABLE_ALL_REF", "0"))),
    # Force Pallas interpret mode (automatic on CPU backends).
    "CONCH_FORCE_INTERPRET": lambda: bool(int(os.getenv("CONCH_FORCE_INTERPRET", "0"))),
    # Route decode-sized (<=128 token) elementwise ops through plain jnp so
    # XLA fuses them into neighboring ops instead of paying a fixed Pallas
    # kernel launch per op (measured ~10s of us each on v5e, dominating the
    # per-layer decode cost). Set to 0 to always use the Pallas kernels.
    "CONCH_SMALL_OP_FUSION": lambda: bool(int(os.getenv("CONCH_SMALL_OP_FUSION", "1"))),
}


def __getattr__(name: str) -> Any:
    if name in environment_variables:
        return environment_variables[name]()
    msg = f"module {__name__!r} has no attribute {name!r}"
    raise AttributeError(msg)


def __dir__() -> list[str]:
    return list(environment_variables.keys())
