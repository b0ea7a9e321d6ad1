# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

from conch_tpu.parallel.mesh import create_mesh
from conch_tpu.parallel.sharding import llama_param_shardings, shard_llama_params

__all__ = ["create_mesh", "llama_param_shardings", "shard_llama_params"]
