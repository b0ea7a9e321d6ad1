# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0
"""Varlen prefill kernel ablation (round 5).

Shape-insensitive ~20 TFLOP/s (exp_varlen_r5.log) with pure matmuls at
184 TFLOP/s in the same window — ablate the all-heads kernel stage by
stage to find the serializer. All variants share the geometry of the
headline case (b8 s2048 qh32 kh8 D128 ps32, cq=2048 rows, ct=1024):

  full      : the shipped pipeline (dots + softmax + DMA waves)
  nodma     : no page copies at all (stale VMEM buffers; wrong values)
  nosoftmax : p = s (no max/exp/sum; wrong values)
  dotsonly  : QK and PV dots + accumulate only
  noqk      : skip the QK dot (s = broadcast scalar)
  nopv      : skip the PV dot (acc += p-mean)
  nocast    : skip the k/v buffer reshape+cast (dot on a fixed tile)
"""

from __future__ import annotations

import functools
import math
import sys, pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

from conch_tpu.kernels.common import use_interpret_mode
from conch_tpu.utils.benchmark import robust_diff_time
from conch_tpu.utils.test_utils import create_paged_fixture

_NEG_INF = -1e30
B, S, QH, KH, D, PS = 8, 2048, 32, 8, 128, 32
G = QH // KH
CQ, CT = 256, 256  # the launcher-chosen shipped geometry
CP = CT // PS


def kernel(bt_ref, slq_ref, slk_ref, q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf, sems, *, mode):
    b = pl.program_id(0)
    t = pl.program_id(1)
    seq_q = slq_ref[b]
    seq_k = slk_ref[b]
    row_start = t * CQ
    chunk_last_q = jnp.minimum((row_start + CQ - 1) // G, seq_q - 1)
    kv_limit = jnp.maximum(seq_k - seq_q + chunk_last_q + 1, 0)
    num_chunks = jax.lax.div(kv_limit + CT - 1, CT)
    last_page = jnp.maximum(jax.lax.div(kv_limit - 1, PS), 0)

    def wave(c, slot):
        for j in range(CP):
            idx = jnp.minimum(c * CP + j, last_page)
            page = bt_ref[b, idx]
            pltpu.make_async_copy(k_hbm.at[page], k_buf.at[slot, :, j], sems.at[slot, 0, j]).start()
            pltpu.make_async_copy(v_hbm.at[page], v_buf.at[slot, :, j], sems.at[slot, 1, j]).start()

    def wait(c, slot):
        for j in range(CP):
            pltpu.make_async_copy(k_hbm.at[0], k_buf.at[slot, :, j], sems.at[slot, 0, j]).wait()
            pltpu.make_async_copy(v_hbm.at[0], v_buf.at[slot, :, j], sems.at[slot, 1, j]).wait()

    if mode in ("shippedlike", "maskonly", "splitonly"):
        CTOK = CT
        full_limit = jnp.clip(seq_k - seq_q + (row_start // G) + 1, 0, kv_limit)
        num_full = jax.lax.div(full_limit, CTOK)
        mask_shape = (CQ, CT)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, mask_shape, dimension=0)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, mask_shape, dimension=1)
        q_idx_rows = (row_start + row_ids) // G
        row_limit = jnp.where(q_idx_rows < seq_q, seq_k - seq_q + q_idx_rows, -1)
        mask_thresh = row_limit - col_ids

    dma = mode != "nodma"
    if dma:
        @pl.when(num_chunks > 0)
        def _():
            wave(0, 0)

    def body(c, carry, masked=False):
        m_prev, l_prev, acc = carry
        slot = jax.lax.rem(c, 2)
        if dma:
            @pl.when(c + 1 < num_chunks)
            def _():
                wave(c + 1, jax.lax.rem(c + 1, 2))
            wait(c, slot)

        if mode == "nocast":
            k3 = jnp.zeros((KH, CT, D), jnp.bfloat16)
            v3 = k3
        else:
            k3 = k_buf[slot].reshape(KH, CT, D)
            v3 = v_buf[slot].reshape(KH, CT, D)
        if mode == "qnat":
            q4 = q_ref[0].reshape(CQ // G, KH, G, D)  # (CQ_Q, QH, D) in
            q3 = jnp.transpose(q4, (1, 0, 2, 3)).reshape(KH, CQ, D)
        else:
            q3 = q_ref[0]

        if mode == "noqk":
            s = jnp.full((KH, CQ, CT), 0.5, jnp.float32)
        else:
            s = jax.lax.dot_general(
                q3, k3, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
        if mode in ("shippedlike", "maskonly") and masked:
            s = jnp.where((c * CT <= mask_thresh)[None, :, :], s, _NEG_INF)
        if mode in ("nosoftmax", "dotsonly"):
            p = s
            m_new, l_new = m_prev, l_prev
        else:
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1))
            p = jnp.exp2(s - m_new[:, :, None])
            alpha = jnp.exp2(m_prev - m_new)
            l_new = l_prev * alpha + jnp.sum(p, axis=-1)
        if mode == "nopv":
            acc = acc + jnp.mean(p, axis=-1, keepdims=True)
        else:
            pv = jax.lax.dot_general(
                p.astype(jnp.bfloat16), v3, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            if mode in ("nosoftmax", "dotsonly"):
                acc = acc + pv
            else:
                acc = acc * jnp.exp2(m_prev - m_new)[:, :, None] + pv
        return m_new, l_new, acc

    carry = (
        jnp.full((KH, CQ), _NEG_INF, jnp.float32),
        jnp.zeros((KH, CQ), jnp.float32),
        jnp.zeros((KH, CQ, D), jnp.float32),
    )
    if mode in ("shippedlike", "splitonly", "maskonly"):
        carry = jax.lax.fori_loop(0, num_full, lambda c, cr: body(c, cr, False), carry)
        m_f, l_f, acc_f = jax.lax.fori_loop(
            num_full, num_chunks, lambda c, cr: body(c, cr, True), carry
        )
    else:
        m_f, l_f, acc_f = jax.lax.fori_loop(0, num_chunks, body, carry)
    normalized = acc_f / jnp.where(l_f > 0.0, l_f, 1.0)[:, :, None]
    if mode == "qnat":
        o4 = normalized.reshape(KH, CQ // G, G, D)
        o_ref[0] = jnp.transpose(o4, (1, 0, 2, 3)).reshape(CQ // G, QH, D).astype(o_ref.dtype)
    else:
        o_ref[0] = normalized.astype(o_ref.dtype)


def make_fn(mode, fx):
    rows = S * G
    nq = rows // CQ

    def fn(q_pad, kc, vc, bt, slq, slk):
        if mode == "qnat":
            cqq = CQ // G
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,
                grid=(B, S // cqq),
                in_specs=[
                    pl.BlockSpec((1, cqq, QH, D), lambda b, t, bt, sq, sk: (b, t, 0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=pl.BlockSpec((1, cqq, QH, D), lambda b, t, bt, sq, sk: (b, t, 0, 0), memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((2, KH, CP, PS, D), jnp.bfloat16),
                    pltpu.VMEM((2, KH, CP, PS, D), jnp.bfloat16),
                    pltpu.SemaphoreType.DMA((2, 2, CP)),
                ],
            )
            return pl.pallas_call(
                functools.partial(kernel, mode=mode),
                out_shape=jax.ShapeDtypeStruct((B, S, QH, D), jnp.bfloat16),
                grid_spec=grid_spec,
                compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
                interpret=use_interpret_mode(),
            )(bt, slq, slk, q_pad, kc, vc)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(B, nq),
            in_specs=[
                pl.BlockSpec((1, KH, CQ, D), lambda b, t, bt, sq, sk: (b, 0, t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, KH, CQ, D), lambda b, t, bt, sq, sk: (b, 0, t, 0), memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, KH, CP, PS, D), jnp.bfloat16),
                pltpu.VMEM((2, KH, CP, PS, D), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2, 2, CP)),
            ],
        )
        return pl.pallas_call(
            functools.partial(kernel, mode=mode),
            out_shape=jax.ShapeDtypeStruct((B, KH, rows, D), jnp.bfloat16),
            grid_spec=grid_spec,
            compiler_params=pltpu.CompilerParams(dimension_semantics=("arbitrary", "arbitrary")),
            interpret=use_interpret_mode(),
        )(bt, slq, slk, q_pad, kc, vc)
    return fn


def main():
    fx = create_paged_fixture(
        np.random.default_rng(0), batch=B, num_q_heads=QH, num_kv_heads=KH,
        head_size=D, page_size=PS, seq_lens=[S] * B, q_lens=[S] * B, dtype=jnp.bfloat16,
    )
    rows = S * G
    q = np.asarray(fx.query).reshape(B, S, KH, G, D).transpose(0, 2, 1, 3, 4).reshape(B, KH, rows, D)
    q_pad = jnp.asarray(q, jnp.bfloat16)
    slq = jnp.full((B,), S, jnp.int32)
    flops = 2 * 2 * B * QH * (S * (S + 1) // 2) * D

    q_nat = jnp.asarray(np.asarray(fx.query).reshape(B, S, QH, D), jnp.bfloat16)
    for mode in ("full", "shippedlike", "qnat"):
        fn = make_fn(mode, fx)

        @functools.partial(jax.jit, static_argnames=("iters",))
        def run(q_pad, kc, vc, bt, slq, iters, fn=fn):
            def body(c, _):
                out = fn(q_pad + c * 1e-30, kc, vc, bt, slq, slq)
                return out.reshape(-1)[0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        args = ((q_nat if mode == "qnat" else q_pad), fx.key_cache, fx.value_cache, fx.block_table, slq)
        I = 8
        try:
            float(np.asarray(run(*args, iters=1)))
            float(np.asarray(run(*args, iters=1 + I)))
        except Exception as e:  # noqa: BLE001
            print(f"{mode:10s} FAILED {type(e).__name__}: {str(e)[:110]}", flush=True)
            continue
        per, ok = robust_diff_time(
            lambda: float(np.asarray(run(*args, iters=1))),
            lambda: float(np.asarray(run(*args, iters=1 + I))),
            I,
        )
        flag = "" if ok else "  [unstable]"
        print(f"{mode:10s} {per*1e3:9.3f} ms  {flops/per/1e12:6.1f} TFLOP/s{flag}", flush=True)


if __name__ == "__main__":
    main()
