# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Conch-TPU: a TPU-native standard library of accelerated AI operations.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``stackav-oss/conch`` (see ``/root/reference``): attention over paged KV
caches, KV-cache management, blockwise/mixed-precision/scaled quantization,
normalization/activation/rotary fusions, vision ops, plus the TPU-native
serving stack (mesh parallelism, continuous batching) that the baseline
north-star requires.

Layer map (mirrors reference ``docs/conch/structure.md``):

- ``conch_tpu.ops``       public op API: validation + output allocation
- ``conch_tpu.kernels``   Pallas TPU kernels ("launchers")
- ``conch_tpu.reference`` pure-jnp golden implementations
- ``conch_tpu.platforms`` TPU generation / capability detection
- ``conch_tpu.models``    flagship model definitions (Llama-class)
- ``conch_tpu.serving``   paged-KV continuous-batching engine
- ``conch_tpu.parallel``  device-mesh sharding (TP/DP over ICI/DCN)
"""

__version__ = "0.1.0"
