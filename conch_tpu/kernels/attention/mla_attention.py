# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU Multi-head Latent Attention (MLA, DeepSeek-V2 family).

MLA caches one compressed vector per token — the kv_lora latent c_kv
(512) plus the shared rope key k_pe (64) — instead of per-head K/V, and
*absorbs* the kv up-projections into the query/output sides at decode
(DeepSeek-V2 paper §2.1.2). In the absorbed form attention is MQA:

    s[h, t]   = (q_nope[h] @ W_uk[h]) . c_kv[t]  +  q_pe[h] . k_pe[t]
    out_lat[h] = softmax(s[h]) @ C            # latent-space output (512)
    out[h]     = out_lat[h] @ W_uv[h]         # absorbed on the host side

TPU-native design decisions (vs a CUDA two-kernel split):

- **Unified cache row**: ``[c_kv | k_pe | zero-pad]`` padded to a lane
  multiple (640 = 5x128 for the standard 512+64). The score needs
  ``q_cat . [c_kv|k_pe]`` — ONE MXU dot per chunk instead of two, and
  one DMA stream instead of two; the pad columns multiply zero query
  columns. The value matrix is the same buffer's first ``latent``
  columns — MLA's K and V share storage by construction, so the kernel
  reads each byte of KV exactly once per query chunk.
- **All query heads ride one KV stream** (true MQA): rows pack
  (query token x head) exactly like the varlen kernel's GQA packing
  with group = num_heads; a (cq_rows, KD) x (KD, chunk) dot feeds every
  head from one chunk fetch.
- Same in-kernel chunked double-buffered page DMA machinery, base-2
  online softmax, causal full/masked split, and index clamping as
  ``varlen_attention.py`` (see that file for the rationale).

Parity anchor: the reference repo has no MLA (stackav-oss/conch stops at
GQA); the behavior oracle is ``transformers`` DeepseekV2 (eager).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import round_up, use_interpret_mode, cast_kv, kv_mxu_dtype

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634


def _mla_dma_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, max_pages) int32
    seq_lens_q_ref,  # (B,) int32
    seq_lens_k_ref,  # (B,) int32
    # inputs
    q_ref,  # (1, cq_rows, KD) VMEM
    kv_hbm,  # (P, ps, KD) ANY/HBM
    # outputs
    o_ref,  # (1, cq_rows, LV) VMEM
    # scratch
    kv_buf,  # (2, C, ps, KD) VMEM
    sems,  # DMA semaphores (2, C)
    m_scr,  # (cq_rows, 128) f32
    l_scr,
    acc_scr,  # (cq_rows, LV) f32
    *,
    page_size: int,
    chunk_pages: int,
    scale: float,
    causal: bool,
    group: int,
    cq_rows: int,
    latent: int,
    v_scale: float = 1.0,
):
    b = pl.program_id(0)
    t = pl.program_id(1)
    seq_q = seq_lens_q_ref[b]
    seq_k = seq_lens_k_ref[b]
    chunk_tokens = chunk_pages * page_size

    row_start = t * cq_rows
    first_q = row_start // group
    chunk_last_q = jnp.minimum((row_start + cq_rows - 1) // group, seq_q - 1)
    chunk_active = (row_start < seq_q * group) & (seq_k > 0)

    if causal:
        kv_limit = jnp.maximum(seq_k - seq_q + chunk_last_q + 1, 0)
        full_limit = jnp.clip(seq_k - seq_q + first_q + 1, 0, kv_limit)
    else:
        kv_limit = seq_k
        full_limit = seq_k
    kv_limit = jnp.where(chunk_active, kv_limit, 0)
    full_limit = jnp.where(chunk_active, full_limit, 0)

    num_chunks = jax.lax.div(kv_limit + chunk_tokens - 1, chunk_tokens)
    num_full = jax.lax.div(full_limit, chunk_tokens)

    m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_dtype = kv_buf.dtype
    mxu_dtype = kv_mxu_dtype(kv_dtype)
    q = q_ref[0].astype(mxu_dtype)  # (cq_rows, KD)
    last_page = jnp.maximum(jax.lax.div(kv_limit - 1, page_size), 0)

    # Hoisted mask threshold (one broadcast compare per masked chunk).
    mask_shape = (cq_rows, chunk_tokens)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, mask_shape, dimension=0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, mask_shape, dimension=1)
    q_idx_rows = (row_start + row_ids) // group
    row_limit = (seq_k - seq_q + q_idx_rows) if causal else jnp.broadcast_to(seq_k - 1, mask_shape)
    row_limit = jnp.where(q_idx_rows < seq_q, row_limit, -1)
    mask_thresh = row_limit - col_ids

    def wave(c, slot):
        copies = []
        for j in range(chunk_pages):
            page = block_tables_ref[b, jnp.minimum(c * chunk_pages + j, last_page)]
            copies.append(
                pltpu.make_async_copy(kv_hbm.at[page], kv_buf.at[slot, j], sems.at[slot, j])
            )
        return copies

    @pl.when(num_chunks > 0)
    def _():
        for cp in wave(0, 0):
            cp.start()

    def process(c, masked: bool):
        slot = jax.lax.rem(c, 2)
        next_slot = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            for cp in wave(c + 1, next_slot):
                cp.start()

        for cp in wave(c, slot):
            cp.wait()

        k = cast_kv(kv_buf[slot].reshape(chunk_tokens, kv_buf.shape[-1]), mxu_dtype)
        # One dot covers latent + rope scores (pad columns hit zero q).
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * (scale * _LOG2E)

        if masked:
            visible = c * chunk_tokens <= mask_thresh
            s = jnp.where(visible, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))

        p = jnp.exp2(s - m_new)
        if masked:
            p = jnp.where(m_new > _NEG_INF / 2, p, 0.0)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[...] = jnp.broadcast_to(l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape)

        v = k[:, :latent]  # value IS the latent prefix of the same buffer
        acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
            p.astype(mxu_dtype), v, preferred_element_type=jnp.float32
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    def full_body(c, _):
        process(c, masked=False)
        return 0

    jax.lax.fori_loop(0, num_full, full_body, 0)

    def masked_body(c, _):
        process(c, masked=True)
        return 0

    jax.lax.fori_loop(num_full, num_chunks, masked_body, 0)

    l = l_scr[:, :1]
    normalized = acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
    o_ref[0] = (normalized * v_scale).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_seqlen_q", "scale", "causal", "latent", "chunk_tokens",
        "q_chunk_rows", "kv_scale",
    ),
)
def mla_attention_launcher(
    query: jax.Array,  # (total_q, num_heads, KD) absorbed [q_lat | q_pe | 0-pad]
    kv_cache: jax.Array,  # (num_pages, page_size, KD) rows [c_kv | k_pe | 0-pad]
    cu_seqlens_q: jax.Array,  # (batch+1,)
    max_seqlen_q: int,
    seq_lens: jax.Array,  # (batch,)
    block_table: jax.Array,  # (batch, max_pages)
    *,
    scale: float,
    latent: int,
    causal: bool = True,
    chunk_tokens: int = 512,
    q_chunk_rows: int = 512,
    kv_scale: float = 1.0,
) -> jax.Array:
    """Varlen multi-head latent attention (prefill AND decode: decode is
    one query token per sequence).

    ``kv_scale`` dequantizes an int8/fp8 latent cache (stored value =
    round(x / kv_scale)): it folds into the softmax scale on the score
    side (K and V share the buffer and the scale) and multiplies the
    final accumulator once — O(1) scalar work, no per-element dequant.

    Returns (total_q, num_heads, latent) — the latent-space attention
    output; the caller applies the absorbed ``W_uv`` per head.
    """
    total_q, num_heads, kd = query.shape
    _, page_size, kd_c = kv_cache.shape
    if kd != kd_c:
        msg = f"query packed dim {kd} != cache packed dim {kd_c}"
        raise ValueError(msg)
    if kd % 128 != 0:
        msg = f"packed MLA dim must be a lane multiple (128), got {kd}: pad [c_kv|k_pe]"
        raise ValueError(msg)
    batch = cu_seqlens_q.shape[0] - 1
    max_pages = block_table.shape[1]
    group = num_heads  # MQA: every head shares the one KV stream

    out_dtype = query.dtype if query.dtype != jnp.float16 else jnp.float32
    if query.dtype == jnp.float16 and not use_interpret_mode():
        query = query.astype(jnp.float32)

    # Ragged -> padded rectangle, heads packed fastest (row = q*H + h).
    token_ids = jnp.arange(total_q, dtype=jnp.int32)
    seq_of_token = jnp.searchsorted(cu_seqlens_q.astype(jnp.int32), token_ids, side="right") - 1
    pos_in_seq = token_ids - cu_seqlens_q.astype(jnp.int32)[seq_of_token]

    q_pad = jnp.zeros((batch, max_seqlen_q, num_heads, kd), dtype=query.dtype)
    q_pad = q_pad.at[seq_of_token, pos_in_seq].set(query)
    q_pad = q_pad.reshape(batch, max_seqlen_q * num_heads, kd)

    total_rows = max_seqlen_q * num_heads
    kv_itemsize = jnp.dtype(kv_cache.dtype).itemsize

    def vmem(cq: int, ct: int) -> int:
        bufs = 2 * ct * kd * kv_itemsize
        stats = cq * (2 * 128 + latent) * 4
        qo = 2 * cq * (kd + latent) * jnp.dtype(query.dtype).itemsize
        return bufs + stats + qo

    budget = 12 * 1024 * 1024
    cq, ct = q_chunk_rows, chunk_tokens
    while vmem(cq, ct) > budget:
        if ct > page_size:
            ct = max(page_size, ct // 2)
        elif cq > max(256, round_up(group, 8)):
            cq = max(256, round_up(group, 8), cq // 2)
        else:
            break
    cq_rows = min(round_up(total_rows, 8), cq if group <= cq else round_up(group, 8))
    cq_rows = max(cq_rows, min(round_up(group, 8), round_up(total_rows, 8)))
    rows_padded = round_up(total_rows, cq_rows)
    if rows_padded != total_rows:
        q_pad = jnp.pad(q_pad, ((0, 0), (0, rows_padded - total_rows), (0, 0)))
    num_q_chunks = rows_padded // cq_rows

    seq_lens_q = (cu_seqlens_q[1:] - cu_seqlens_q[:-1]).astype(jnp.int32)
    chunk_pages = max(1, min(ct // page_size, max_pages))

    def q_index(b, t, bt, slq, slk):
        return (b, t, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(batch, num_q_chunks),
        in_specs=[
            pl.BlockSpec((1, cq_rows, kd), q_index, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, cq_rows, latent), q_index, memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, chunk_pages, page_size, kd), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, chunk_pages)),
            pltpu.VMEM((cq_rows, 128), jnp.float32),
            pltpu.VMEM((cq_rows, 128), jnp.float32),
            pltpu.VMEM((cq_rows, latent), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _mla_dma_kernel,
            page_size=page_size,
            chunk_pages=chunk_pages,
            scale=scale * kv_scale,  # k-side dequant folds into the scores
            causal=causal,
            group=group,
            cq_rows=cq_rows,
            latent=latent,
            v_scale=kv_scale,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, rows_padded, latent), out_dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=use_interpret_mode(),
    )(
        block_table.astype(jnp.int32),
        seq_lens_q,
        seq_lens.astype(jnp.int32),
        q_pad,
        kv_cache,
    )

    out = out[:, :total_rows, :].reshape(batch, max_seqlen_q, num_heads, latent)
    return out[seq_of_token, pos_in_seq]
