# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU paged attention (decode): one query token per sequence.

TPU-native re-design of the reference's FlashDecoding Triton kernels
(``conch/kernels/attention/paged_attention.py:18-584``). Key differences,
by design:

- **Chunked double-buffered page DMAs**: the KV caches stay in HBM
  (``memory_space=ANY``); the kernel walks each sequence's block table
  with ``pltpu.make_async_copy``, fetching a *chunk* of pages per wave
  (``chunk_pages`` copies issued back-to-back into one VMEM slab) and
  prefetching chunk ``c+1`` while the MXU works on chunk ``c``. Single
  page-sized transfers (4-8 KB) cannot hide HBM latency on their own;
  a wave of 8-16 of them keeps enough bytes in flight to stream the KV
  pool at near-peak bandwidth. The grid is (batch, kv_heads) — one grid
  step per (sequence, head) amortizes pipeline overhead across the whole
  sequence, and the chunk-loop bound is the *actual* per-sequence page
  count (no wasted DMAs for short sequences in a padded batch).
- **No two-stage KV-split + LSE merge**: the reference splits a long
  sequence across SMs and merges partials by log-sum-exp because CUDA
  SMs need the parallelism (``:297-421``). A TPU core pipelines chunks
  through VMEM in one online-softmax pass.
- **GQA via query-group packing**: queries are reshaped to
  (batch, kv_heads, group, head) so each chunk contributes one
  (group, head) x (head, chunk_tokens) MXU dot (reference packs query
  groups the same way, ``varlen_attention.py:635-658``).
- **fp8/int8 KV dequantization folds into scalars**: ``q.(k*ks) =
  (q.k)*ks`` — k-scale folds into the softmax scale (before softcap),
  v-scale multiplies the final accumulator once (the reference
  dequantizes per element, ``paged_attention.py:194-198,246-250``).
- **Any head size**: manual DMAs require the lane (head) dimension to be
  a multiple of 128 on current Mosaic; odd head sizes (80/96/112/192...)
  are routed through the BlockSpec-pipelined varlen kernel, which
  handles them natively (decode is varlen with one query per sequence).

Cache layout: (num_pages, num_kv_heads, page_size, head_size) — one
(page, head) slice is a Mosaic-native (page_size, head) tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import round_up, use_interpret_mode, cast_kv, kv_mxu_dtype

_NEG_INF = -1e30
_LOG2E = 1.4426950408889634  # softmax in base 2 (exp2 is cheaper on the VPU)


def _paged_allheads_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, max_pages) int32
    seq_lens_ref,  # (B,) int32
    layer_ref,  # (1,) int32 (stacked-cache layer index; 0 when unstacked)
    # inputs
    q_ref,  # (1, KH, G_pad, D) VMEM
    k_hbm,  # (P, KH, ps, D) ANY/HBM
    v_hbm,
    k_scale_ref,  # (1,) SMEM
    v_scale_ref,  # (1,) SMEM
    # outputs
    o_ref,  # (1, KH, G_pad, D) VMEM
    # scratch
    k_buf,  # (2, KH, C, ps, D) VMEM
    v_buf,
    sems,  # DMA semaphores (2, 2, C)
    m_scr,  # (KH*G_pad, 128) f32
    l_scr,
    acc_scr,  # (KH*G_pad, D) f32
    *,
    page_size: int,
    chunk_pages: int,
    scale: float,
    softcap: float,
    window: int = 0,
    ring_pages: int = 0,
    num_kv_heads: int,
    group_pad: int,
    stacked: bool = False,
):
    """All-kv-heads decode: one page DMA feeds every head.

    Per-head (ps, D) page slices are 4-16 KB; at the measured ~35
    descriptor-issues/us the per-head kernel tops out near 280 GB/s no
    matter the wave width. Whole (KH, ps, D) pages carry KH x the bytes
    per descriptor, moving the bottleneck back to HBM bandwidth.
    """
    b = pl.program_id(0)
    chunk_tokens = chunk_pages * page_size

    def geometry(seq):
        """(seq_len, num_pages, num_chunks, start_chunk) for sequence seq."""
        sl = seq_lens_ref[seq]
        npg = jax.lax.div(sl + page_size - 1, page_size)
        nch = jax.lax.div(npg + chunk_pages - 1, chunk_pages)
        sc = jax.lax.div(jnp.maximum(sl - window, 0), chunk_tokens) if window > 0 else 0
        return sl, npg, nch, sc

    seq_len, num_pages, num_chunks, start_chunk = geometry(b)

    m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_dtype = k_buf.dtype
    mxu_dtype = kv_mxu_dtype(kv_dtype)
    eff_scale = scale * k_scale_ref[0]

    def wave(seq, lastp, c, slot, action):
        """Start or wait chunk ``c``'s page copies — ONLY the in-range
        ones. Clamping out-of-range pages to the last page would DMA
        ``chunk_pages`` pages regardless of sequence length: at ctx 128
        (2 pages) that is 8x wasted HBM traffic, the round-4 ~100 GB/s
        short-context ceiling. Start and wait share one predicate, so
        every started copy is awaited.
        """
        for j in range(chunk_pages):
            pos = c * chunk_pages + j
            idx = jnp.minimum(pos, lastp)
            if ring_pages > 0:
                # Rolling KV buffer: true position page -> ring slot (the
                # window skip bounds the walk to live ring entries).
                idx = jax.lax.rem(idx, ring_pages)
            page = block_tables_ref[seq, idx]
            ksrc = k_hbm.at[layer_ref[0], page] if stacked else k_hbm.at[page]
            vsrc = v_hbm.at[layer_ref[0], page] if stacked else v_hbm.at[page]
            kcp = pltpu.make_async_copy(ksrc, k_buf.at[slot, :, j], sems.at[slot, 0, j])
            vcp = pltpu.make_async_copy(vsrc, v_buf.at[slot, :, j], sems.at[slot, 1, j])

            @pl.when(pos <= lastp)
            def _(kcp=kcp, vcp=vcp):
                if action == "start":
                    kcp.start()
                    vcp.start()
                else:
                    kcp.wait()
                    vcp.wait()

    last_page = jnp.maximum(num_pages - 1, 0)

    # Cross-grid-step pipelining: step b-1's epilogue issued THIS step's
    # first wave (scratch buffers and semaphores persist across grid
    # steps), so only the very first sequence issues its own — and zeroes
    # the chunk buffers first: skipped (out-of-range) copies leave their
    # buffer rows untouched, and uninitialized VMEM can hold inf/nan bit
    # patterns that poison the masked compute (0 * inf in the PV dot).
    @pl.when((num_chunks > 0) & (b == 0))
    def _():
        k_buf[...] = jnp.zeros_like(k_buf)
        v_buf[...] = jnp.zeros_like(v_buf)
        wave(b, last_page, start_chunk, jax.lax.rem(start_chunk, 2), "start")

    def process(c, masked: bool):
        slot = jax.lax.rem(c, 2)
        next_slot = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            wave(b, last_page, c + 1, next_slot, "start")

        wave(b, last_page, c, slot, "wait")

        # Head-BATCHED compute: at decode shapes the per-head op-issue
        # overhead (8 heads x ~8 small VPU/MXU ops per chunk) dominates the
        # actual work, so every stage runs once over a (KH, ...) batch —
        # one batched QK dot, one 3D online-softmax update, one batched PV.
        kh, gp = num_kv_heads, group_pad
        d = k_buf.shape[-1]
        q3 = q_ref[0].astype(mxu_dtype)  # (KH, G_pad, D)
        k3 = cast_kv(k_buf[slot].reshape(kh, chunk_tokens, d), mxu_dtype)
        s = jax.lax.dot_general(
            q3, k3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (KH, G_pad, chunk_tokens)
        if softcap > 0.0:
            s = s * eff_scale
            s = softcap * jnp.tanh(s / softcap) * _LOG2E
        else:
            s = s * (eff_scale * _LOG2E)

        if masked:
            entry_pos = c * chunk_tokens + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, dimension=2
            )
            visible = entry_pos < seq_len
            if window > 0:
                visible &= entry_pos >= seq_len - window
            s = jnp.where(visible, s, _NEG_INF)

        m_prev = m_scr[:, :1].reshape(kh, gp, 1)
        l_prev = l_scr[:, :1].reshape(kh, gp, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))

        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        l_scr[...] = jnp.broadcast_to(
            l_new.reshape(kh * gp, 1), (kh * gp, l_scr.shape[-1])
        )

        v3 = cast_kv(v_buf[slot].reshape(kh, chunk_tokens, d), mxu_dtype)
        pv = jax.lax.dot_general(
            p.astype(mxu_dtype), v3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (KH, G_pad, D)
        acc_scr[...] = acc_scr[...] * alpha.reshape(kh * gp, 1) + pv.reshape(kh * gp, d)
        m_scr[...] = jnp.broadcast_to(
            m_new.reshape(kh * gp, 1), (kh * gp, m_scr.shape[-1])
        )

    num_full = jax.lax.div(seq_len, chunk_tokens)

    def full_body(c, _):
        process(c, masked=window > 0)
        return 0

    # start_chunk (shared with the prologue wave: prefetch slot parity
    # MUST match the loop) skips chunks wholly before the window.
    jax.lax.fori_loop(start_chunk, num_full, full_body, 0)

    @pl.when(num_full < num_chunks)
    def _():
        process(num_full, masked=True)

    # Epilogue: prefetch the NEXT sequence's first wave so its DMA streams
    # while this step normalizes/writes and the next step ramps up. All of
    # this step's waves were awaited above, so the buffers are free.
    @pl.when(b + 1 < pl.num_programs(0))
    def _():
        sl1, npg1, nch1, sc1 = geometry(b + 1)

        @pl.when(nch1 > 0)
        def _():
            wave(b + 1, jnp.maximum(npg1 - 1, 0), sc1, jax.lax.rem(sc1, 2), "start")

    for h in range(num_kv_heads):
        r0, r1 = h * group_pad, (h + 1) * group_pad
        l = l_scr[r0:r1, :1]
        normalized = acc_scr[r0:r1, :] / jnp.where(l > 0.0, l, 1.0)
        o_ref[0, h] = (normalized * v_scale_ref[0]).astype(o_ref.dtype)


def _paged_attention_kernel(
    # scalar prefetch
    block_tables_ref,  # (B, max_pages) int32
    seq_lens_ref,  # (B,) int32
    layer_ref,  # (1,) int32
    # inputs
    q_ref,  # (1, 1, G_pad, D) VMEM
    k_hbm,  # (P, KH, ps, D) ANY/HBM
    v_hbm,  # (P, KH, ps, D) ANY/HBM
    k_scale_ref,  # (1,) SMEM
    v_scale_ref,  # (1,) SMEM
    # outputs
    o_ref,  # (1, 1, G_pad, D) VMEM
    # scratch
    k_buf,  # (2, C, ps, D) VMEM
    v_buf,  # (2, C, ps, D) VMEM
    sems,  # DMA semaphores (2, 2, C)
    m_scr,  # (G_pad, 128) f32
    l_scr,
    acc_scr,  # (G_pad, D) f32
    *,
    page_size: int,
    chunk_pages: int,
    scale: float,
    softcap: float,
    window: int = 0,
    ring_pages: int = 0,
    stacked: bool = False,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    seq_len = seq_lens_ref[b]
    num_pages = jax.lax.div(seq_len + page_size - 1, page_size)
    num_chunks = jax.lax.div(num_pages + chunk_pages - 1, chunk_pages)
    chunk_tokens = chunk_pages * page_size

    m_scr[...] = jnp.full_like(m_scr, _NEG_INF)
    l_scr[...] = jnp.zeros_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    # MXU eats the cache dtype directly (bf16 x bf16 -> f32): no VMEM-wide
    # f32 casts in the hot loop. int8/fp8 caches still upcast (no bf16 rep).
    kv_dtype = k_buf.dtype
    mxu_dtype = kv_mxu_dtype(kv_dtype)
    q = q_ref[0, 0].astype(mxu_dtype)  # (G_pad, D)
    eff_scale = scale * k_scale_ref[0]
    last_page = jnp.maximum(num_pages - 1, 0)

    def wave(c, slot, action):
        """Start or wait chunk ``c``'s page copies in buffer ``slot``.

        Only in-range pages are copied (start and wait share one
        predicate): clamping out-of-range pages to the last page would
        DMA ``chunk_pages`` pages regardless of sequence length — 8x
        wasted HBM traffic at ctx 128 with 1024-token chunks.
        """
        for j in range(chunk_pages):
            pos = c * chunk_pages + j
            idx = jnp.minimum(pos, last_page)
            if ring_pages > 0:
                # Rolling KV buffer: true position page -> ring slot.
                idx = jax.lax.rem(idx, ring_pages)
            page = block_tables_ref[b, idx]
            ksrc = k_hbm.at[layer_ref[0], page, h] if stacked else k_hbm.at[page, h]
            vsrc = v_hbm.at[layer_ref[0], page, h] if stacked else v_hbm.at[page, h]
            kcp = pltpu.make_async_copy(ksrc, k_buf.at[slot, j], sems.at[slot, 0, j])
            vcp = pltpu.make_async_copy(vsrc, v_buf.at[slot, j], sems.at[slot, 1, j])

            @pl.when(pos <= last_page)
            def _(kcp=kcp, vcp=vcp):
                if action == "start":
                    kcp.start()
                    vcp.start()
                else:
                    kcp.wait()
                    vcp.wait()

    start_chunk = (
        jax.lax.div(jnp.maximum(seq_len - window, 0), chunk_tokens) if window > 0 else 0
    )

    # Zero the buffers on the first grid step: skipped copies leave rows
    # stale, and uninitialized VMEM can hold inf/nan patterns that poison
    # the masked compute (0 * inf in the PV dot).
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        k_buf[...] = jnp.zeros_like(k_buf)
        v_buf[...] = jnp.zeros_like(v_buf)

    @pl.when(num_chunks > 0)
    def _():
        wave(start_chunk, jax.lax.rem(start_chunk, 2), "start")

    def process(c, masked: bool):
        """Online-softmax update for chunk ``c`` (mask only the tail chunk:
        interior chunks are fully inside the sequence by construction, so
        the iota/compare/select VPU work is skipped for them)."""
        slot = jax.lax.rem(c, 2)
        next_slot = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < num_chunks)
        def _():
            wave(c + 1, next_slot, "start")

        wave(c, slot, "wait")

        k = cast_kv(k_buf[slot].reshape(chunk_tokens, k_buf.shape[-1]), mxu_dtype)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * eff_scale  # (G_pad, chunk_tokens)

        if softcap > 0.0:
            s = softcap * jnp.tanh(s / softcap)

        if masked:
            entry_pos = c * chunk_tokens + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
            visible = entry_pos < seq_len
            if window > 0:
                visible &= entry_pos >= seq_len - window
            s = jnp.where(visible, s, _NEG_INF)

        m_prev = m_scr[:, :1]
        l_prev = l_scr[:, :1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))

        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_scr[...] = jnp.broadcast_to(l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True), l_scr.shape)

        v = cast_kv(v_buf[slot].reshape(chunk_tokens, v_buf.shape[-1]), mxu_dtype)
        acc_scr[...] = acc_scr[...] * alpha + jnp.dot(
            p.astype(mxu_dtype), v, preferred_element_type=jnp.float32
        )
        m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)

    # Interior chunks (fully valid) then the tail chunk (masked). A
    # sequence whose length is an exact chunk multiple has no tail.
    num_full = jax.lax.div(seq_len, chunk_tokens)

    def full_body(c, _):
        process(c, masked=window > 0)
        return 0

    # start_chunk (shared with the prologue wave: prefetch slot parity
    # MUST match the loop) skips chunks wholly before the window.
    jax.lax.fori_loop(start_chunk, num_full, full_body, 0)

    @pl.when(num_full < num_chunks)
    def _():
        process(num_full, masked=True)

    l = l_scr[:, :1]
    normalized = acc_scr[...] / jnp.where(l > 0.0, l, 1.0)
    o_ref[0, 0] = (normalized * v_scale_ref[0]).astype(o_ref.dtype)


def _decode_via_varlen(
    query, key_cache, value_cache, block_table, seq_lens, *, scale, softcap, k_scale, v_scale,
    window_size=0, ring_pages=0, layer_idx=None,
):
    """Decode as single-token varlen attention (BlockSpec pipeline).

    Used for head sizes the manual-DMA kernel cannot address (lane dim not
    a multiple of 128): the varlen kernel's automatic pipeline handles any
    head size, at somewhat lower decode throughput.
    """
    from conch_tpu.kernels.attention.varlen_attention import varlen_attention_launcher

    batch = query.shape[0]
    cu = jnp.arange(batch + 1, dtype=jnp.int32)
    return varlen_attention_launcher(
        query,
        key_cache,
        value_cache,
        cu,
        1,
        seq_lens,
        block_table,
        scale=scale,
        softcap=softcap,
        causal=False,
        k_scale=k_scale,
        v_scale=v_scale,
        window_size=window_size,
        ring_pages=ring_pages,
        layer_idx=layer_idx,
    )


@functools.partial(
    jax.jit,
    static_argnames=("scale", "softcap", "chunk_tokens", "window_size", "ring_pages"),
)
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
    chunk_tokens: int = 1024,
    window_size: int = 0,
    ring_pages: int = 0,
    layer_idx: jax.Array | None = None,
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
        chunk_tokens: target KV tokens per DMA wave (tuning knob; the wave
            holds ceil(chunk_tokens/page_size) page copies in flight).
        ring_pages: rolling KV buffer — the block table's first
            ``ring_pages`` entries form a ring holding position ``p`` at
            slot ``p % (ring_pages*page_size)``; requires
            ``window_size > 0`` and a ring covering the window (the
            serving engine guarantees both). 0 disables.

    Returns:
        (batch, num_q_heads, head_size) attention output in the query dtype
        (bf16 if the query is fp8).
    """
    if ring_pages > 0 and window_size <= 0:
        msg = "ring_pages (rolling KV) requires window_size > 0"
        raise ValueError(msg)
    stacked = layer_idx is not None
    batch, num_q_heads, head_size = query.shape
    num_kv_heads, page_size = key_cache.shape[-3], key_cache.shape[-2]
    layer_arr = (
        jnp.zeros((1,), jnp.int32) if layer_idx is None
        else layer_idx.astype(jnp.int32).reshape(1)
    )
    group = num_q_heads // num_kv_heads

    out_dtype = query.dtype
    if query.dtype == jnp.float8_e4m3fn:
        out_dtype = jnp.bfloat16
        query = query.astype(jnp.bfloat16)
    if query.dtype == jnp.float16 and not use_interpret_mode():
        query = query.astype(jnp.float32)

    if head_size % 128 != 0:
        return _decode_via_varlen(
            query, key_cache, value_cache, block_table, seq_lens,
            scale=scale, softcap=softcap, k_scale=k_scale, v_scale=v_scale,
            window_size=window_size, ring_pages=ring_pages, layer_idx=layer_idx,
        ).astype(out_dtype)

    # Query-group packing: (B, QH, D) -> (B, KH, G_pad, D).
    group_pad = round_up(group, 8)
    q_grouped = query.reshape(batch, num_kv_heads, group, head_size)
    if group_pad != group:
        q_grouped = jnp.pad(q_grouped, ((0, 0), (0, 0), (0, group_pad - group), (0, 0)))

    one = jnp.ones((1,), dtype=jnp.float32)
    k_scale_arr = one if k_scale is None else k_scale.astype(jnp.float32).reshape(1)
    v_scale_arr = one if v_scale is None else v_scale.astype(jnp.float32).reshape(1)

    # All-heads path: one page DMA feeds every kv head (see kernel
    # docstring — per-head page slices are DMA-issue-bound). Falls back to
    # the per-head kernel when the KH-wide chunk buffers would not fit VMEM.
    kv_itemsize = jnp.dtype(key_cache.dtype).itemsize
    ah_chunk_tokens = min(chunk_tokens, 1024)
    ah_chunk_pages = max(1, min(ah_chunk_tokens // page_size, block_table.shape[1]))
    ah_bufs = 2 * 2 * num_kv_heads * ah_chunk_pages * page_size * head_size * kv_itemsize
    ah_stats = num_kv_heads * group_pad * (2 * 128 + head_size) * 4
    if ah_bufs + ah_stats <= 10 * 1024 * 1024:
        def q_index_ah(b, bt, sl, li):
            return (b, 0, 0, 0)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(batch,),
            in_specs=[
                pl.BlockSpec(
                    (1, num_kv_heads, group_pad, head_size), q_index_ah, memory_space=pltpu.VMEM
                ),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, num_kv_heads, group_pad, head_size), q_index_ah, memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, num_kv_heads, ah_chunk_pages, page_size, head_size), key_cache.dtype
                ),
                pltpu.VMEM(
                    (2, num_kv_heads, ah_chunk_pages, page_size, head_size), value_cache.dtype
                ),
                pltpu.SemaphoreType.DMA((2, 2, ah_chunk_pages)),
                pltpu.VMEM((num_kv_heads * group_pad, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads * group_pad, 128), jnp.float32),
                pltpu.VMEM((num_kv_heads * group_pad, head_size), jnp.float32),
            ],
        )

        out = pl.pallas_call(
            functools.partial(
                _paged_allheads_kernel,
                page_size=page_size,
                chunk_pages=ah_chunk_pages,
                scale=scale,
                softcap=softcap,
                window=window_size,
                ring_pages=ring_pages,
                num_kv_heads=num_kv_heads,
                group_pad=group_pad,
                stacked=stacked,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (batch, num_kv_heads, group_pad, head_size), out_dtype
            ),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=use_interpret_mode(),
        )(
            block_table.astype(jnp.int32), seq_lens.astype(jnp.int32), layer_arr,
            q_grouped, key_cache, value_cache, k_scale_arr, v_scale_arr,
        )
        return out[:, :, :group, :].reshape(batch, num_q_heads, head_size)

    # Pages per DMA wave: enough bytes in flight to hide HBM latency, but
    # never more pages than the table can hold.
    chunk_pages = max(1, min(chunk_tokens // page_size, block_table.shape[1]))

    def q_index(b, h, bt, sl, li):
        return (b, h, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
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
            pltpu.VMEM((2, chunk_pages, page_size, head_size), key_cache.dtype),
            pltpu.VMEM((2, chunk_pages, page_size, head_size), value_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2, chunk_pages)),
            pltpu.VMEM((group_pad, 128), jnp.float32),
            pltpu.VMEM((group_pad, 128), jnp.float32),
            pltpu.VMEM((group_pad, head_size), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(
            _paged_attention_kernel,
            page_size=page_size,
            chunk_pages=chunk_pages,
            scale=scale,
            softcap=softcap,
            window=window_size,
            ring_pages=ring_pages,
            stacked=stacked,
        ),
        out_shape=jax.ShapeDtypeStruct((batch, num_kv_heads, group_pad, head_size), out_dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=use_interpret_mode(),
    )(block_table.astype(jnp.int32), seq_lens.astype(jnp.int32), layer_arr, q_grouped, key_cache, value_cache, k_scale_arr, v_scale_arr)

    return out[:, :, :group, :].reshape(batch, num_q_heads, head_size)
