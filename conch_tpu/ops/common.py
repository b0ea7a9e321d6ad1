# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Shared helpers for the public ops layer."""

from __future__ import annotations

SMALL_OP_TOKEN_THRESHOLD = 128


def fuse_small_op(num_tokens: int) -> bool:
    """True when a decode-sized elementwise op should ride XLA fusion.

    Pallas kernels win at prefill scale (thousands of rows), but each call
    costs a fixed kernel launch that cannot fuse with its neighbors. At
    decode sizes (a few rows) that fixed cost dominates the decode step, so
    the ops layer falls back to the numerically identical jnp reference and
    lets XLA fuse it into the surrounding computation. Only active on real
    TPU backends (interpret-mode test runs keep exercising the kernels) and
    gated by ``CONCH_SMALL_OP_FUSION``.
    """
    from conch_tpu import envs
    from conch_tpu.kernels.common import use_interpret_mode

    return (
        num_tokens <= SMALL_OP_TOKEN_THRESHOLD
        and not use_interpret_mode()
        and envs.CONCH_SMALL_OP_FUSION
    )
