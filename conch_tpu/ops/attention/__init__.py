# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

from conch_tpu.ops.attention.mla_attention import mla_attention
from conch_tpu.ops.attention.paged_attention import PagedAttentionMetadata, paged_attention
from conch_tpu.ops.attention.varlen_attention import varlen_attention

__all__ = ["PagedAttentionMetadata", "mla_attention", "paged_attention", "varlen_attention"]
