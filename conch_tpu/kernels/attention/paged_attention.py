# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU paged attention (decode): one query token per sequence.

TPU-native re-design of the reference's FlashDecoding Triton kernels
(``conch/kernels/attention/paged_attention.py:18-584``). Key differences,
by design:

- **Manual double-buffered page DMAs**: the KV caches stay in HBM
  (``memory_space=ANY``); the kernel walks each sequence's block table
  with ``pltpu.make_async_copy``, prefetching page ``i+1`` while the MXU
  works on page ``i``. The grid is just (batch, kv_heads) — one grid
  step per (sequence, head) amortizes all per-step pipeline overhead
  across the whole sequence, and the page loop bound is the *actual*
  per-sequence page count (no wasted DMAs for short sequences in a
  padded batch).
- **No two-stage KV-split + LSE merge**: the reference splits a long
  sequence across SMs and merges partials by log-sum-exp because CUDA
  SMs need the parallelism (``:297-421``). A TPU core pipelines pages
  through VMEM in one online-softmax pass.
- **GQA via query-group packing**: queries are reshaped to
  (batch, kv_heads, group, head) so each page contributes one
  (group, head) x (head, page) MXU dot (reference packs query groups the
  same way, ``varlen_attention.py:635-658``).
- **fp8/int8 KV dequantization folds into scalars**: ``q.(k*ks) =
  (q.k)*ks`` — k-scale folds into the softmax scale (before softcap),
  v-scale multiplies the final accumulator once (the reference
  dequantizes per element, ``paged_attention.py:194-198,246-250``).

Cache layout: (num_pages, num_kv_heads, page_size, head_size) — one
(page, head) slice is a Mosaic-native (page_size, head) tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import round_up, use_interpret_mode

_NEG_INF = -1e30


def _paged_attention_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, max_pages) int32
    seq_lens_ref,  # (B,) int32
    # inputs
    q_ref,  # (1, 1, G_pad, D) VMEM
    k_hbm,  # (P, KH, ps, D) ANY/HBM
    v_hbm,  # (P, KH, ps, D) ANY/HBM
    k_scale_ref,  # (1,) SMEM
    v_scale_ref,  # (1,) SMEM
    # outputs
    o_ref,  # (1, 1, G_pad, D) VMEM
    # scratch
    k_buf,  # (2, ps, D) VMEM
    v_buf,  # (2, ps, D) VMEM
    sems,  # DMA semaphores (2, 2)
    m_scr,  # (G_pad, 128) f32
    l_scr,
    acc_scr,  # (G_pad, D) f32
    *,
    page_size: int,
    scale: float,
    softcap: float,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    seq_len = seq_lens_ref[b]
    num_pages = jax.lax.div(seq_len + page_size - 1, page_size)

    m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0].astype(jnp.float32)  # (G_pad, D)
    eff_scale = scale * k_scale_ref[0]

    def page_dma(i, slot):
        page = block_tables_ref[b, i]
        return (
            pltpu.make_async_copy(k_hbm.at[page, h], k_buf.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(v_hbm.at[page, h], v_buf.at[slot], sems.at[slot, 1]),
        )

    @pl.when(num_pages > 0)
    def _():
        dk, dv = page_dma(0, 0)
        dk.start()
        dv.start()

    def body(i, _):
        slot = jax.lax.rem(i, 2)
        next_slot = jax.lax.rem(i + 1, 2)

        @pl.when(i + 1 < num_pages)
        def _():
            dk, dv = page_dma(i + 1, next_slot)
            dk.start()
            dv.start()

        dk, dv = page_dma(i, slot)
        dk.wait()
        dv.wait()

        k = k_buf[slot].astype(jnp.float32)  # (ps, D)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * eff_scale  # (G_pad, ps)

        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)

        entry_pos = i * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(entry_pos < seq_len, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))

        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[...] = jnp.broadcast_to(l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape)

        v = v_buf[slot].astype(jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        return 0

    jax.lax.fori_loop(0, num_pages, body, 0)

    l = l_scr[:, :1]
    normalized = acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
    o_ref[0, 0] = (normalized * v_scale_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap"))
def paged_attention_launcher(
    query: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    block_table: jax.Array,
    seq_lens: jax.Array,
    *,
    scale: float,
    softcap: float = 0.0,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """Decode-time paged attention.

    Args:
        query: (batch, num_q_heads, head_size).
        key_cache/value_cache: (num_pages, num_kv_heads, page_size, head_size);
            fp8/int8 caches are dequantized via the folded scales.
        block_table: (batch, max_pages_per_seq) int32 physical page ids.
        seq_lens: (batch,) int32 current sequence lengths.
        scale: softmax scale (1/sqrt(head_size)).
        softcap: logit softcap (0 disables).
        k_scale/v_scale: dequantization scales (default 1.0).

    Returns:
        (batch, num_q_heads, head_size) attention output in the query dtype
        (bf16 if the query is fp8).
    """
    batch, num_q_heads, head_size = query.shape
    _, num_kv_heads, page_size, _ = key_cache.shape
    group = num_q_heads // num_kv_heads

    out_dtype = query.dtype
    if query.dtype == jnp.float8_e4m3fn:
        out_dtype = jnp.bfloat16
        query = query.astype(jnp.bfloat16)
    if query.dtype == jnp.float16 and not use_interpret_mode():
        query = query.astype(jnp.float32)

    # Query-group packing: (B, QH, D) -> (B, KH, G_pad, D).
    group_pad = round_up(group, 8)
    q_grouped = query.reshape(batch, num_kv_heads, group, head_size)
    if group_pad != group:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    one = jnp.ones((1,), dtype=jnp.float32)
    k_scale_arr = one if k_scale is None else k_scale.astype(jnp.float32).reshape(1)
    v_scale_arr = one if v_scale is None else v_scale.astype(jnp.float32).reshape(1)

    def q_index(b, h, bt, sl):
        return (b, h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_kv_heads),
        in_specs=[
            pl.BlockSpec((1, 1, group_pad, head_size), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, group_pad, head_size), q_index, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, page_size, head_size), key_cache.dtype),
            pltpu.VMEM((2, page_size, head_size), value_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((group_pad, 128), jnp.float32),
            pltpu.VMEM((group_pad, 128), jnp.float32),
            pltpu.VMEM((group_pad, head_size), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _paged_attention_kernel,
            page_size=page_size,
            scale=scale,
            softcap=softcap,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, num_kv_heads, group_pad, head_size), out_dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=use_interpret_mode(),
    )(block_table.astype(jnp.int32), seq_lens.astype(jnp.int32), q_grouped, key_cache, value_cache, k_scale_arr, v_scale_arr)

    return out[:, :, :group, :].reshape(batch, num_q_heads, head_size)
