# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU varlen attention: prefill + decode over a paged KV cache.

TPU-native re-design of the reference's two-stage varlen Triton kernel
(``conch/kernels/attention/varlen_attention.py:57-869``). The reference
walks ragged queries with ``cu_seqlens_q`` pointer arithmetic and splits
long KV ranges across SMs with an LSE merge; on TPU we instead:

- **Pad per-sequence queries to a rectangle** (batch, max_q, heads, head)
  in the launcher (one XLA scatter), because Pallas BlockSpecs address
  memory in whole-block units - ragged starts can't steer the automatic
  DMA pipeline. Padded rows are masked out and never gathered back.
- **Pack GQA groups into MXU rows**: queries are laid out
  (batch, kv_heads, max_q * group, head) so one grid step issues a
  (q_rows, head) x (head, page) dot for a whole query chunk including all
  its grouped heads (reference packs query groups the same way,
  ``:635-658``).
- **Single online-softmax pass** over KV, with the block table steering
  *in-kernel chunked double-buffered page DMAs* (``make_async_copy``
  waves, exactly the paged_attention.py machinery) - no KV-split
  scratchpads or reduce stage. The grid is (batch, kv_heads, q_chunks):
  putting KV pages in the grid instead (one page per step) costs a fixed
  per-step overhead times ~100k steps and re-fetches each page per query
  chunk through the automatic pipeline — measured 36x slower at
  Llama-8B prefill shapes.
- **Causal work split**: chunks fully below the query chunk's causal
  frontier take an unmasked fast path; only the diagonal band pays the
  iota/compare/select masking. Pages past the frontier are never fetched.
- **Causal masking by position algebra**: query token ``j`` of a sequence
  sits at KV position ``seq_len_k - seq_len_q + j`` (the queries are the
  trailing tokens of the sequence), matching the reference's convention.
- **fp8 Q/K/V via folded scalars**: q_scale and k_scale fold into the
  softmax scale (applied before softcap), v_scale scales the final
  accumulator - dequantization is O(1) scalar multiplies, not per-element.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import round_up, use_interpret_mode, cast_kv, kv_mxu_dtype

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634  # softmax in base 2: exp2 is cheaper than exp
# on the VPU, and the online-softmax recurrence is base-invariant once the
# logits carry a log2(e) factor.


def _varlen_dma_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, max_pages) int32
    seq_lens_q_ref,  # (B,) int32
    seq_lens_k_ref,  # (B,) int32
    layer_ref,  # (1,) int32 (stacked-cache layer index; 0 when unstacked)
    # inputs
    q_ref,  # (1, 1, cq_rows, D) VMEM
    k_hbm,  # (P, KH, ps, D) ANY/HBM
    v_hbm,  # (P, KH, ps, D) ANY/HBM
    qk_scale_ref,  # (1,) SMEM
    v_scale_ref,  # (1,) SMEM
    # outputs
    o_ref,  # (1, 1, cq_rows, D) VMEM
    # scratch
    k_buf,  # (2, C, ps, D) VMEM
    v_buf,
    sems,  # DMA semaphores (2, 2, C)
    m_scr,  # (cq_rows, 128) f32
    l_scr,
    acc_scr,  # (cq_rows, D) f32
    *,
    page_size: int,
    chunk_pages: int,
    softcap: float,
    causal: bool,
    group: int,
    cq_rows: int,
    window: int = 0,
    ring_pages: int = 0,
    stacked: bool = False,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    t = pl.program_id(2)
    seq_q = seq_lens_q_ref[b]
    seq_k = seq_lens_k_ref[b]
    chunk_tokens = chunk_pages * page_size

    row_start = t * cq_rows
    first_q = row_start // group
    chunk_last_q = jnp.minimum((row_start + cq_rows - 1) // group, seq_q - 1)
    chunk_active = (row_start < seq_q * group) & (seq_k > 0)

    # KV tokens this query chunk must see; tokens valid for EVERY row.
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
    if window > 0:
        # Sliding window: row r's first visible KV position is
        # seq_k - seq_q + q_idx(r) - window + 1 — minimal at first_q,
        # maximal at chunk_last_q. Chunks wholly before EVERY row's window
        # are skipped outright (no DMA, no compute); chunks at/after every
        # row's window start keep the causal full/masked split; the band
        # between pays the lower-bound mask.
        win_low_min = seq_k - seq_q + first_q - window + 1
        win_low_max = seq_k - seq_q + chunk_last_q - window + 1
        start_chunk = jax.lax.div(jnp.maximum(win_low_min, 0), chunk_tokens)
        full_start = jax.lax.div(
            jnp.maximum(win_low_max, 0) + chunk_tokens - 1, chunk_tokens
        )
        full_start = jnp.clip(full_start, start_chunk, num_full)
    else:
        start_chunk = jnp.zeros_like(num_chunks)
        full_start = jnp.zeros_like(num_chunks)
    start_chunk = jnp.minimum(start_chunk, num_chunks)

    m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_dtype = k_buf.dtype
    mxu_dtype = kv_mxu_dtype(kv_dtype)
    q = q_ref[0, 0].astype(mxu_dtype)  # (cq_rows, D)
    eff_scale = qk_scale_ref[0]
    last_page = jnp.maximum(jax.lax.div(kv_limit - 1, page_size), 0)

    # Mask threshold, hoisted out of the chunk loop (see the all-heads
    # kernel for the derivation): one broadcast compare per masked chunk.
    mask_shape = (cq_rows, chunk_tokens)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, mask_shape, dimension=0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, mask_shape, dimension=1)
    q_idx_rows = (row_start + row_ids) // group
    row_limit = (seq_k - seq_q + q_idx_rows) if causal else jnp.broadcast_to(seq_k - 1, mask_shape)
    row_limit = jnp.where(q_idx_rows < seq_q, row_limit, -1)
    mask_thresh = row_limit - col_ids
    # Window lower bound anchors at each row's own position (also for
    # non-causal): k_pos >= q_pos - window + 1.
    win_pos = seq_k - seq_q + q_idx_rows
    low_thresh = (win_pos - (window - 1)) - col_ids

    def wave(c, slot):
        copies = []
        for j in range(chunk_pages):
            idx = jnp.minimum(c * chunk_pages + j, last_page)
            if ring_pages > 0:
                # Rolling KV buffer: true position page -> ring slot. The
                # window skip already bounds the walk to positions whose
                # ring slots still hold them (cap >= window + chunk slack).
                idx = jax.lax.rem(idx, ring_pages)
            page = block_tables_ref[b, idx]
            ksrc = k_hbm.at[layer_ref[0], page, h] if stacked else k_hbm.at[page, h]
            vsrc = v_hbm.at[layer_ref[0], page, h] if stacked else v_hbm.at[page, h]
            copies.append(
                pltpu.make_async_copy(ksrc, k_buf.at[slot, j], sems.at[slot, 0, j])
            )
            copies.append(
                pltpu.make_async_copy(vsrc, v_buf.at[slot, j], sems.at[slot, 1, j])
            )
        return copies

    @pl.when(start_chunk < num_chunks)
    def _():
        for cp in wave(start_chunk, jax.lax.rem(start_chunk, 2)):
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

        k = cast_kv(k_buf[slot].reshape(chunk_tokens, k_buf.shape[-1]), mxu_dtype)
        if softcap > 0.0:
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * eff_scale  # (cq_rows, chunk_tokens)
            s = softcap * jnp.tanh(s / softcap) * _LOG2E
        else:
            # log2(e) folded into the scale: softmax runs in base 2.
            s = jax.lax.dot_general(
                q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            ) * (eff_scale * _LOG2E)

        if masked:
            visible = c * chunk_tokens <= mask_thresh
            if window > 0:
                visible &= c * chunk_tokens >= low_thresh
            s = jnp.where(visible, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))

        p = jnp.exp2(s - m_new)
        if masked:
            # Fully-masked rows (query padding): keep p at 0.
            p = jnp.where(m_new > _NEG_INF / 2, p, 0.0)
        alpha = jnp.exp2(m_prev - m_new)
        l_scr[...] = jnp.broadcast_to(l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape)

        v = cast_kv(v_buf[slot].reshape(chunk_tokens, v_buf.shape[-1]), mxu_dtype)
        acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
            p.astype(mxu_dtype), v, preferred_element_type=jnp.float32
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    def full_body(c, _):
        process(c, masked=False)
        return 0

    def masked_body(c, _):
        process(c, masked=True)
        return 0

    if window > 0:
        jax.lax.fori_loop(start_chunk, full_start, masked_body, 0)
        jax.lax.fori_loop(full_start, num_full, full_body, 0)
    else:
        jax.lax.fori_loop(0, num_full, full_body, 0)
    jax.lax.fori_loop(num_full, num_chunks, masked_body, 0)

    l = l_scr[:, :1]
    normalized = acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
    o_ref[0, 0] = (normalized * v_scale_ref[0]).astype(o_ref.dtype)


def _varlen_dma_allheads_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, max_pages) int32
    seq_lens_q_ref,  # (B,) int32
    seq_lens_k_ref,  # (B,) int32
    layer_ref,  # (1,) int32 (stacked-cache layer index; 0 when unstacked)
    # inputs
    q_ref,  # (1, KH, cq_rows, D) VMEM
    k_hbm,  # (P, KH, ps, D) ANY/HBM
    v_hbm,
    qk_scale_ref,  # (1,) SMEM
    v_scale_ref,  # (1,) SMEM
    # outputs
    o_ref,  # (1, KH, cq_rows, D) VMEM
    # scratch
    k_buf,  # (2, KH, C, ps, D) VMEM
    v_buf,
    sems,  # DMA semaphores (2, 2, C)
    *,
    page_size: int,
    chunk_pages: int,
    softcap: float,
    causal: bool,
    group: int,
    cq_rows: int,
    num_kv_heads: int,
    window: int = 0,
    ring_pages: int = 0,
    stacked: bool = False,
):
    """All-kv-heads variant: one page DMA feeds every head.

    Small page slices make the DMA issue rate the bottleneck (measured
    ~25-35 copies/us on v5e — 4 KB per-head page slices cap the stream at
    ~100-280 GB/s no matter how wide the waves are). Copying whole
    (KH, ps, D) pages moves KH x the bytes per descriptor; the head loop
    runs inside the kernel over the shared chunk buffer.

    The online-softmax state (m, l, acc) rides the chunk loop as fori_loop
    VALUE carries, not VMEM scratch: the scratch form re-broadcast m/l to
    (KH*cq, 128) lanes and re-initialized 3 MB of scratch every grid
    step — a fixed cost that decode amortizes over many KV chunks but
    causal prefill (~2-4 chunks per query chunk) does not; the scratch
    kernel measured 3% of window bandwidth at b8 s2048 prefill
    (BENCH_RESULTS round-5 first pass).
    """
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
    if window > 0:
        # Sliding window chunk-skip: see _varlen_dma_kernel. Chunks wholly
        # before every row's window are skipped (no DMA); chunks at/after
        # every row's window start keep the causal full/masked split.
        win_low_min = seq_k - seq_q + first_q - window + 1
        win_low_max = seq_k - seq_q + chunk_last_q - window + 1
        start_chunk = jax.lax.div(jnp.maximum(win_low_min, 0), chunk_tokens)
        full_start = jax.lax.div(
            jnp.maximum(win_low_max, 0) + chunk_tokens - 1, chunk_tokens
        )
        full_start = jnp.clip(full_start, start_chunk, num_full)
    else:
        start_chunk = jnp.zeros_like(num_chunks)
        full_start = jnp.zeros_like(num_chunks)
    start_chunk = jnp.minimum(start_chunk, num_chunks)

    kv_dtype = k_buf.dtype
    mxu_dtype = kv_mxu_dtype(kv_dtype)
    eff_scale = qk_scale_ref[0]
    last_page = jnp.maximum(jax.lax.div(kv_limit - 1, page_size), 0)

    # Mask threshold, hoisted out of the chunk loop (the iota/div/multi-
    # compare build dominated the diagonal chunks — measured ~1.5x on
    # causal prefill). Row r's last visible KV position is
    # seq_k - seq_q + q_idx(r) (causal) or seq_k - 1; padding rows get -1.
    # Each masked chunk then needs ONE broadcast compare:
    # k_pos <= limit  <=>  c*chunk_tokens <= thresh.
    mask_shape = (cq_rows, chunk_tokens)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, mask_shape, dimension=0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, mask_shape, dimension=1)
    q_idx_rows = (row_start + row_ids) // group
    row_limit = (seq_k - seq_q + q_idx_rows) if causal else jnp.broadcast_to(seq_k - 1, mask_shape)
    row_limit = jnp.where(q_idx_rows < seq_q, row_limit, -1)
    mask_thresh = row_limit - col_ids
    win_pos = seq_k - seq_q + q_idx_rows
    low_thresh = (win_pos - (window - 1)) - col_ids

    def wave(c, slot):
        copies = []
        for j in range(chunk_pages):
            idx = jnp.minimum(c * chunk_pages + j, last_page)
            if ring_pages > 0:
                # Rolling KV buffer: true position page -> ring slot.
                idx = jax.lax.rem(idx, ring_pages)
            page = block_tables_ref[b, idx]
            ksrc = k_hbm.at[layer_ref[0], page] if stacked else k_hbm.at[page]
            vsrc = v_hbm.at[layer_ref[0], page] if stacked else v_hbm.at[page]
            copies.append(
                pltpu.make_async_copy(ksrc, k_buf.at[slot, :, j], sems.at[slot, 0, j])
            )
            copies.append(
                pltpu.make_async_copy(vsrc, v_buf.at[slot, :, j], sems.at[slot, 1, j])
            )
        return copies

    @pl.when(start_chunk < num_chunks)
    def _():
        for cp in wave(start_chunk, jax.lax.rem(start_chunk, 2)):
            cp.start()

    kh, d = num_kv_heads, k_buf.shape[-1]
    # Natural-layout q block (cq_q, QH, D) -> (KH, cq_rows, D) GQA row
    # packing, ONCE per grid step in VMEM (hoisted out of the chunk loop).
    # This replaces a host-side transpose of the whole padded query.
    cq_q = cq_rows // group
    q4 = q_ref[0].reshape(cq_q, num_kv_heads, group, d)
    q3 = jnp.transpose(q4, (1, 0, 2, 3)).reshape(kh, cq_rows, d).astype(mxu_dtype)

    def process(c, carry, masked: bool):
        m_prev, l_prev, acc = carry  # (KH, cq), (KH, cq), (KH, cq, D)
        slot = jax.lax.rem(c, 2)
        next_slot = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            for cp in wave(c + 1, next_slot):
                cp.start()

        for cp in wave(c, slot):
            cp.wait()

        # Mask is head-independent: one broadcast compare per chunk.
        if masked:
            mask = c * chunk_tokens <= mask_thresh
            if window > 0:
                mask &= c * chunk_tokens >= low_thresh

        # Head-BATCHED compute (see paged_attention.py): one batched QK
        # dot, one 3D online-softmax update, one batched PV — avoids
        # num_kv_heads sequential small-op chains per chunk.
        k3 = cast_kv(k_buf[slot].reshape(kh, chunk_tokens, d), mxu_dtype)
        s = jax.lax.dot_general(
            q3, k3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (KH, cq_rows, chunk_tokens)
        if softcap > 0.0:
            s = s * eff_scale
            s = softcap * jnp.tanh(s / softcap) * _LOG2E
        else:
            # log2(e) folded into the scale: softmax runs in base 2.
            s = s * (eff_scale * _LOG2E)
        if masked:
            s = jnp.where(mask[None, :, :], s, _NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))

        p = jnp.exp2(s - m_new[:, :, None])
        if masked:
            # Fully-masked rows (query padding): keep p at 0.
            p = jnp.where((m_new > _NEG_INF / 2)[:, :, None], p, 0.0)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1)

        v3 = cast_kv(v_buf[slot].reshape(kh, chunk_tokens, d), mxu_dtype)
        pv = jax.lax.dot_general(
            p.astype(mxu_dtype), v3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (KH, cq_rows, D)
        acc = acc * alpha[:, :, None] + pv
        return m_new, l_new, acc

    def full_body(c, carry):
        return process(c, carry, masked=False)

    def masked_body(c, carry):
        return process(c, carry, masked=True)

    carry = (
        jnp.full((kh, cq_rows), _NEG_INF, jnp.float32),
        jnp.zeros((kh, cq_rows), jnp.float32),
        jnp.zeros((kh, cq_rows, d), jnp.float32),
    )
    if window > 0:
        carry = jax.lax.fori_loop(start_chunk, full_start, masked_body, carry)
        carry = jax.lax.fori_loop(full_start, num_full, full_body, carry)
    else:
        carry = jax.lax.fori_loop(0, num_full, full_body, carry)
    m_fin, l_fin, acc_fin = jax.lax.fori_loop(num_full, num_chunks, masked_body, carry)

    normalized = (acc_fin / jnp.where(l_fin > 0.0, l_fin, 1.0)[:, :, None]) * v_scale_ref[0]
    # Invert the GQA packing into the natural (cq_q, QH, D) output block.
    o4 = normalized.reshape(kh, cq_q, group, d)
    o_ref[0] = jnp.transpose(o4, (1, 0, 2, 3)).reshape(cq_q, kh * group, d).astype(o_ref.dtype)


def _varlen_attention_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, max_pages) int32
    seq_lens_q_ref,  # (B,) int32
    seq_lens_k_ref,  # (B,) int32
    # inputs
    q_ref,  # (1, 1, cq_rows, D)
    k_ref,  # (1, 1, ps, D)
    v_ref,  # (1, 1, ps, D)
    qk_scale_ref,  # (1,) SMEM: scale * q_scale * k_scale
    v_scale_ref,  # (1,) SMEM
    # outputs
    o_ref,  # (1, 1, cq_rows, D)
    # scratch
    m_scr,
    l_scr,
    acc_scr,
    *,
    page_size: int,
    softcap: float,
    causal: bool,
    group: int,
    cq_rows: int,
    num_pages: int,
    window: int = 0,
    ring_pages: int = 0,
):
    b = pl.program_id(0)
    t = pl.program_id(2)
    i = pl.program_id(3)
    seq_q = seq_lens_q_ref[b]
    seq_k = seq_lens_k_ref[b]

    # Query token index of each row in this chunk (rows pack the GQA group
    # fastest: row r of chunk t is query token (t*cq_rows + r) // group).
    row_start = t * cq_rows

    @pl.when(i == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # Last query token index covered by this chunk, in KV coordinates.
    chunk_last_q = jnp.minimum((row_start + cq_rows - 1) // group, seq_q - 1)
    chunk_last_kv_pos = seq_k - seq_q + chunk_last_q if causal else seq_k - 1

    if window > 0:
        first_q = row_start // group
        win_low_min = seq_k - seq_q + first_q - window + 1
    if ring_pages > 0:
        # Rolling KV buffer: the grid addresses the window band directly —
        # step i covers true-position page i_lo + i (the index map fetches
        # its ring slot), since true pages can outnumber both the table
        # width and the ring.
        i_t = jnp.maximum(win_low_min, 0) // page_size + i
    else:
        i_t = i

    chunk_active = row_start < seq_q * group
    page_active = i_t * page_size < seq_k
    causal_active = i_t * page_size <= chunk_last_kv_pos
    if window > 0:
        # Pages wholly before every row's window contribute nothing; the
        # index map clamps their fetch away, this skips their compute.
        window_active = (i_t + 1) * page_size > win_low_min
    else:
        window_active = True

    @pl.when(chunk_active & page_active & causal_active & window_active)
    def _():
        q = q_ref[0, 0].astype(jnp.float32)  # (cq_rows, D)
        k = k_ref[0, 0].astype(jnp.float32)  # (ps, D)

        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * qk_scale_ref[0]  # (cq_rows, ps)

        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)

        row_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=0)
        q_idx = (row_start + row_ids) // group
        k_pos = i_t * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)

        mask = k_pos < seq_k
        q_pos = seq_k - seq_q + q_idx
        if causal:
            mask &= k_pos <= q_pos
        if window > 0:
            mask &= k_pos > q_pos - window
        s = jnp.where(mask, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)

        p = jnp.exp(s - m_new)
        # Fully-masked rows: keep p at 0 to avoid inf propagation.
        p = jnp.where(m_new > _NEG_INF / 2, p, 0.0)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)

        v = v_ref[0, 0].astype(jnp.float32)
        acc_scr[...] = acc_scr[...] * alpha + jnp.dot(p, v, preferred_element_type=jnp.float32)
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
        l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(i == num_pages - 1)
    def _():
        l = l_scr[:, :1]
        normalized = acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
        o_ref[0, 0] = (normalized * v_scale_ref[0]).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "max_seqlen_q", "scale", "softcap", "causal", "chunk_tokens",
        "q_chunk_rows", "window_size", "ring_pages",
    ),
)
def varlen_attention_launcher(
    query: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    cu_seqlens_q: jax.Array,
    max_seqlen_q: int,
    seq_lens: jax.Array,
    block_table: jax.Array,
    *,
    scale: float,
    softcap: float = 0.0,
    causal: bool = False,
    q_scale: jax.Array | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    chunk_tokens: int = 1024,
    q_chunk_rows: int = 512,
    window_size: int = 0,
    ring_pages: int = 0,
    layer_idx: jax.Array | None = None,
) -> jax.Array:
    """Variable-length attention over a paged KV cache.

    Args:
        query: (total_num_q, num_q_heads, head_size) ragged queries; the
            queries of sequence b are rows cu_seqlens_q[b]..cu_seqlens_q[b+1],
            and are the *trailing* tokens of that sequence.
        key_cache/value_cache: (num_pages, num_kv_heads, page_size, head).
        cu_seqlens_q: (batch+1,) cumulative query counts.
        max_seqlen_q: static upper bound on per-sequence query count.
        seq_lens: (batch,) KV sequence lengths.
        block_table: (batch, max_pages_per_seq) physical page ids.
        ring_pages: rolling KV buffer — the block table's first
            ``ring_pages`` entries form a ring holding position ``p`` at
            slot ``(p % (ring_pages*page_size))``. Requires
            ``window_size > 0`` with a ring large enough to cover the
            window plus in-flight writes (the serving engine guarantees
            both). 0 disables.

    Returns:
        (total_num_q, num_q_heads, head_size) output in the query dtype
        (bf16 for fp8 queries).
    """
    if ring_pages > 0 and window_size <= 0:
        msg = "ring_pages (rolling KV) requires window_size > 0"
        raise ValueError(msg)
    stacked = layer_idx is not None
    total_q, num_q_heads, head_size = query.shape
    num_kv_heads, page_size = key_cache.shape[-3], key_cache.shape[-2]
    layer_arr = (
        jnp.zeros((1,), jnp.int32) if layer_idx is None
        else layer_idx.astype(jnp.int32).reshape(1)
    )
    if stacked and head_size % 128 != 0:
        # BlockSpec fallback (odd head sizes) has no in-kernel layer
        # indexing: slice the layer out (one 2x layer copy, fallback only).
        key_cache = jax.lax.dynamic_index_in_dim(key_cache, layer_arr[0], 0, keepdims=False)
        value_cache = jax.lax.dynamic_index_in_dim(value_cache, layer_arr[0], 0, keepdims=False)
        stacked = False
        layer_arr = jnp.zeros((1,), jnp.int32)
    batch = cu_seqlens_q.shape[0] - 1
    max_pages = block_table.shape[1]
    group = num_q_heads // num_kv_heads

    out_dtype = query.dtype
    if query.dtype == jnp.float8_e4m3fn:
        out_dtype = jnp.bfloat16
        query = query.astype(jnp.bfloat16)
    if query.dtype == jnp.float16 and not use_interpret_mode():
        query = query.astype(jnp.float32)

    # --- Ragged -> padded rectangle (B, max_q, QH, D) -------------------
    # GATHER with clamped indices, not zeros+scatter: the scatter lowers
    # ~40% slower on TPU (3.0 vs 2.2 ms at b8 s2048 qh32, r5 probe), and
    # rows past a sequence's length may hold garbage — they are masked to
    # -inf in the kernel (row_limit = -1) and never gathered back out.
    token_ids = jnp.arange(total_q, dtype=jnp.int32)
    seq_of_token = jnp.searchsorted(cu_seqlens_q.astype(jnp.int32), token_ids, side="right") - 1
    pos_in_seq = token_ids - cu_seqlens_q.astype(jnp.int32)[seq_of_token]

    def padded_q(mq: int) -> jax.Array:
        """(B, mq, QH, D) row-padded queries (clamped gather)."""
        pad_idx = jnp.clip(
            cu_seqlens_q.astype(jnp.int32)[:-1, None]
            + jnp.arange(mq, dtype=jnp.int32)[None, :],
            0,
            total_q - 1,
        )
        return jnp.take(query, pad_idx.reshape(-1), axis=0).reshape(
            batch, mq, num_q_heads, head_size
        )

    total_rows = max_seqlen_q * group
    # Path choice. Manual-DMA kernels need lane-aligned heads; among them,
    # fetching whole (KH, ps, D) pages (all-heads kernel) moves KH x the
    # bytes per DMA descriptor — the issue rate, not bandwidth, is the
    # bottleneck for per-head page slices — whenever the working set fits
    # VMEM. The BlockSpec fallback handles odd head sizes.
    dma_path = head_size % 128 == 0
    kv_itemsize = jnp.dtype(key_cache.dtype).itemsize

    def _allheads_vmem(cq: int, ct: int) -> int:
        bufs = 2 * 2 * num_kv_heads * ct * head_size * kv_itemsize
        # Online-softmax state is fori_loop-carried (m, l, acc) — roughly
        # one (KH, cq, D) f32 acc plus narrow m/l vectors.
        stats = num_kv_heads * cq * (head_size + 2 * 8) * 4
        qo = 2 * 2 * num_kv_heads * cq * head_size * jnp.dtype(query.dtype).itemsize
        # In-kernel chunk-load temporaries: each processed KV chunk is
        # loaded from its double buffer and reshaped ((slot) -> (ct, KH*D))
        # before the MXU dots — Mosaic stack-allocates those copies on top
        # of the declared scratch. Omitting this term let a 13.6 MB
        # estimate compile to a 22.4 MB stack and OOM scoped VMEM at
        # page_size 16 (engine prefill, tools/drive/logs/engine_r4.log).
        temps = 2 * num_kv_heads * ct * head_size * kv_itemsize
        # s and p — the (KH, cq, ct) f32 softmax logits/weights — are the
        # largest stack temporaries with the loop-carried state (r5: an
        # unmodeled pair OOM'd at cq=256, ct=512 with 17.96 MB).
        softmax_tmp = 2 * num_kv_heads * cq * ct * 4
        return bufs + stats + qo + temps + softmax_tmp

    # Refetch traffic scales as total_rows / cq_rows (each query chunk
    # re-reads its KV prefix), so prefer the LARGEST cq_rows the VMEM
    # budget allows, shrinking whichever of (kv bufs, stats+q/o) costs
    # more. Floors: one page per chunk, one GQA group of rows.
    budget = 12 * 1024 * 1024
    ah_cq, ah_ct = q_chunk_rows, chunk_tokens
    while _allheads_vmem(ah_cq, ah_ct) > budget:
        kv_cost = 4 * num_kv_heads * ah_ct * head_size * kv_itemsize
        can_ct = ah_ct > page_size
        can_cq = ah_cq > max(256, group)
        if not (can_ct or can_cq):
            break
        if can_ct and (kv_cost * 2 > _allheads_vmem(ah_cq, ah_ct) or not can_cq):
            ah_ct = max(page_size, ah_ct // 2)
        else:
            ah_cq = max(256, group, ah_cq // 2)
    all_heads = dma_path and _allheads_vmem(ah_cq, ah_ct) <= budget
    cq_cap = (ah_cq if all_heads else q_chunk_rows) if dma_path else 256
    cq_rows = min(round_up(total_rows, 8), cq_cap if group <= cq_cap else round_up(group, 8))
    cq_rows = max(cq_rows, round_up(group, 8))
    if all_heads:
        # Natural-q layout: the kernel consumes (1, cq_q, QH, D) blocks
        # and repacks to (KH, cq_rows, D) in VMEM — the host-side GQA
        # transpose of the whole padded query (2 x 134 MB of HBM layout
        # traffic at Llama-8B prefill, ~40% of the op's wall time in
        # round-5 profiling) disappears. cq_rows must then be a whole
        # number of query tokens.
        cq_rows = round_up(cq_rows, group)
        cq_q = cq_rows // group
        mq_pad = round_up(max_seqlen_q, cq_q)
        rows_padded = mq_pad * group
        q_pad = padded_q(mq_pad)
    else:
        q_nat = padded_q(max_seqlen_q)
        # (B, max_q, KH, G, D) -> (B, KH, max_q*G, D): group packs fastest.
        q_pad = q_nat.reshape(batch, max_seqlen_q, num_kv_heads, group, head_size)
        q_pad = q_pad.transpose(0, 2, 1, 3, 4).reshape(
            batch, num_kv_heads, max_seqlen_q * group, head_size
        )
        rows_padded = round_up(total_rows, cq_rows)
        if rows_padded != total_rows:
            q_pad = jnp.pad(q_pad, ((0, 0), (0, 0), (0, rows_padded - total_rows), (0, 0)))
    num_q_chunks = rows_padded // cq_rows

    seq_lens_q = (cu_seqlens_q[1:] - cu_seqlens_q[:-1]).astype(jnp.int32)

    one = jnp.ones((), dtype=jnp.float32)
    qk_scale = scale * (one if q_scale is None else q_scale.astype(jnp.float32).reshape(())) * (
        one if k_scale is None else k_scale.astype(jnp.float32).reshape(())
    )
    v_scale_arr = (one if v_scale is None else v_scale.astype(jnp.float32).reshape(())).reshape(1)

    if all_heads:
        chunk_pages = max(1, min(ah_ct // page_size, max_pages))

        def q_index_ah(b, t, bt, slq, slk, li):
            return (b, t, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(batch, num_q_chunks),
            in_specs=[
                pl.BlockSpec((1, cq_q, num_q_heads, head_size), q_index_ah, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, cq_q, num_q_heads, head_size), q_index_ah, memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, num_kv_heads, chunk_pages, page_size, head_size), key_cache.dtype),
                pltpu.VMEM((2, num_kv_heads, chunk_pages, page_size, head_size), value_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2, chunk_pages)),
            ],
        )

        out = pl.pallas_call(
            functools.partial(
                _varlen_dma_allheads_kernel,
                page_size=page_size,
                chunk_pages=chunk_pages,
                softcap=softcap,
                causal=causal,
                window=window_size,
                ring_pages=ring_pages,
                group=group,
                cq_rows=cq_rows,
                num_kv_heads=num_kv_heads,
                stacked=stacked,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, mq_pad, num_q_heads, head_size), out_dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=use_interpret_mode(),
        )(
            block_table.astype(jnp.int32),
            seq_lens_q,
            seq_lens.astype(jnp.int32),
            layer_arr,
            q_pad,
            key_cache,
            value_cache,
            qk_scale.reshape(1),
            v_scale_arr,
        )
        # Natural layout out: (B, mq_pad, QH, D) -> ragged rows directly.
        out = out.reshape(batch * mq_pad, num_q_heads, head_size)
        return jnp.take(out, seq_of_token * mq_pad + pos_in_seq, axis=0)
    elif dma_path:
        chunk_pages = max(1, min(chunk_tokens // page_size, max_pages))

        def q_index_dma(b, h, t, bt, slq, slk, li):
            return (b, h, t, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(batch, num_kv_heads, num_q_chunks),
            in_specs=[
                pl.BlockSpec((1, 1, cq_rows, head_size), q_index_dma, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, cq_rows, head_size), q_index_dma, memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, chunk_pages, page_size, head_size), key_cache.dtype),
                pltpu.VMEM((2, chunk_pages, page_size, head_size), value_cache.dtype),
                pltpu.SemaphoreType.DMA((2, 2, chunk_pages)),
                pltpu.VMEM((cq_rows, 128), jnp.float32),
                pltpu.VMEM((cq_rows, 128), jnp.float32),
                pltpu.VMEM((cq_rows, head_size), jnp.float32),
            ],
        )

        out = pl.pallas_call(
            functools.partial(
                _varlen_dma_kernel,
                page_size=page_size,
                chunk_pages=chunk_pages,
                softcap=softcap,
                causal=causal,
                window=window_size,
                ring_pages=ring_pages,
                group=group,
                cq_rows=cq_rows,
                stacked=stacked,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, num_kv_heads, rows_padded, head_size), out_dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            ),
            interpret=use_interpret_mode(),
        )(
            block_table.astype(jnp.int32),
            seq_lens_q,
            seq_lens.astype(jnp.int32),
            layer_arr,
            q_pad,
            key_cache,
            value_cache,
            qk_scale.reshape(1),
            v_scale_arr,
        )
    else:
        def q_index(b, h, t, i, bt, slq, slk):
            return (b, h, t, 0)

        def kv_index(b, h, t, i, bt, slq, slk):
            # Clamp i to this (sequence, chunk)'s last *active* page. Steps past
            # it map to the same block as the last active step, so the Pallas
            # pipeline skips their fetch entirely — no DMAs for pages beyond
            # seq_len (short sequences in a padded batch) or beyond the causal
            # frontier of this query chunk.
            last_kv = slk[b] - 1
            if causal:
                chunk_last_q = jnp.minimum((t * cq_rows + cq_rows - 1) // group, slq[b] - 1)
                last_kv = jnp.minimum(last_kv, slk[b] - slq[b] + chunk_last_q)
            i_max = jnp.maximum(last_kv, 0) // page_size
            if window_size > 0:
                first_q = (t * cq_rows) // group
                win_low_min = slk[b] - slq[b] + first_q - window_size + 1
                i_min = jnp.minimum(jnp.maximum(win_low_min, 0) // page_size, i_max)
            else:
                i_min = 0
            if ring_pages > 0:
                # Rolling buffer: grid step i addresses true page i_min + i
                # (mirrors the kernel's i_t); fetch its ring slot.
                i_eff = jnp.clip(i_min + i, i_min, i_max)
                return (bt[b, jax.lax.rem(i_eff, ring_pages)], h, 0, 0)
            # Low-side clamp: steps before the first window page all map
            # to that page, so the pipeline fetches it once and skips
            # the dead prefix.
            i_eff = jnp.clip(i, i_min, i_max)
            return (bt[b, i_eff], h, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch, num_kv_heads, num_q_chunks, max_pages),
            in_specs=[
                pl.BlockSpec((1, 1, cq_rows, head_size), q_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, page_size, head_size), kv_index, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, page_size, head_size), kv_index, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, cq_rows, head_size), q_index, memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((cq_rows, 128), jnp.float32),
                pltpu.VMEM((cq_rows, 128), jnp.float32),
                pltpu.VMEM((cq_rows, head_size), jnp.float32),
            ],
        )

        out = pl.pallas_call(
            functools.partial(
                _varlen_attention_kernel,
                page_size=page_size,
                softcap=softcap,
                causal=causal,
                window=window_size,
                ring_pages=ring_pages,
                group=group,
                cq_rows=cq_rows,
                num_pages=max_pages,
            ),
            out_shape=jax.ShapeDtypeStruct((batch, num_kv_heads, rows_padded, head_size), out_dtype),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            ),
            interpret=use_interpret_mode(),
        )(
            block_table.astype(jnp.int32),
            seq_lens_q,
            seq_lens.astype(jnp.int32),
            q_pad,
            key_cache,
            value_cache,
            qk_scale.reshape(1),
            v_scale_arr,
        )

    # Padded rectangle -> ragged: invert the packing, then ONE flat take
    # (a 2D advanced-index gather lowers to a slower multi-dim gather).
    out = out[:, :, :total_rows, :].reshape(batch, num_kv_heads, max_seqlen_q, group, head_size)
    out = out.transpose(0, 2, 1, 3, 4).reshape(batch * max_seqlen_q, num_q_heads, head_size)
    return jnp.take(out, seq_of_token * max_seqlen_q + pos_in_seq, axis=0)
