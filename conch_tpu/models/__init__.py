# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

from conch_tpu.models.gemma import (
    GemmaConfig,
    gemma_decode_step,
    gemma_prefill,
    init_gemma_params,
)
from conch_tpu.models.llama import (
    LlamaConfig,
    init_llama_params,
    llama_decode_step,
    llama_prefill,
    requantize_llama_params,
)

__all__ = [
    "GemmaConfig",
    "LlamaConfig",
    "gemma_decode_step",
    "gemma_prefill",
    "init_gemma_params",
    "init_llama_params",
    "llama_decode_step",
    "llama_prefill",
    "requantize_llama_params",
]
