# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

from conch_tpu.types.scalar_type import NanRepr, ScalarType, scalar_types

__all__ = ["NanRepr", "ScalarType", "scalar_types"]
