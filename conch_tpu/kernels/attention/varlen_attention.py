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
- **Single online-softmax pass** over KV pages (innermost grid dim), with
  the block table steering page DMAs via scalar prefetch - no KV-split
  scratchpads or reduce stage (see paged_attention.py for rationale).
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

from conch_tpu.kernels.common import round_up, use_interpret_mode

_NEG_INF = -1e30


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

    chunk_active = row_start < seq_q * group
    page_active = i * page_size < seq_k
    causal_active = i * page_size <= chunk_last_kv_pos

    @pl.when(chunk_active & page_active & causal_active)
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
        k_pos = i * page_size + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)

        mask = k_pos < seq_k
        if causal:
            q_pos = seq_k - seq_q + q_idx
            mask &= k_pos <= q_pos
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
    jax.jit, static_argnames=("max_seqlen_q", "scale", "softcap", "causal")
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

    Returns:
        (total_num_q, num_q_heads, head_size) output in the query dtype
        (bf16 for fp8 queries).
    """
    total_q, num_q_heads, head_size = query.shape
    _, num_kv_heads, page_size, _ = key_cache.shape
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
    token_ids = jnp.arange(total_q, dtype=jnp.int32)
    seq_of_token = jnp.searchsorted(cu_seqlens_q.astype(jnp.int32), token_ids, side="right") - 1
    pos_in_seq = token_ids - cu_seqlens_q.astype(jnp.int32)[seq_of_token]

    q_pad = jnp.zeros((batch, max_seqlen_q, num_q_heads, head_size), dtype=query.dtype)
    q_pad = q_pad.at[seq_of_token, pos_in_seq].set(query)

    # (B, max_q, KH, G, D) -> (B, KH, max_q*G, D): group packs fastest.
    q_pad = q_pad.reshape(batch, max_seqlen_q, num_kv_heads, group, head_size)
    q_pad = q_pad.transpose(0, 2, 1, 3, 4).reshape(batch, num_kv_heads, max_seqlen_q * group, head_size)

    total_rows = max_seqlen_q * group
    cq_rows = min(round_up(total_rows, 8), 256 if group <= 256 else round_up(group, 8))
    cq_rows = max(cq_rows, round_up(group, 8))
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
        i_eff = jnp.minimum(i, i_max)
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

    # Padded rectangle -> ragged: invert the packing and gather valid rows.
    out = out[:, :, :total_rows, :].reshape(batch, num_kv_heads, max_seqlen_q, group, head_size)
    out = out.transpose(0, 2, 1, 3, 4).reshape(batch, max_seqlen_q, num_q_heads, head_size)
    return out[seq_of_token, pos_in_seq]
