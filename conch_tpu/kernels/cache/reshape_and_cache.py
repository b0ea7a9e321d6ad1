# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Paged KV-cache token insertion (vLLM ``reshape_and_cache`` equivalent).

TPU-native re-design of the reference Triton kernel
(``conch/kernels/vllm/reshape_and_cache.py:111-189``). The reference
scatters each token's K/V vector through raw pointers; TPU has no raw
device pointers, so the scatter is expressed as an XLA scatter
(``cache.at[page, entry].set``) with *donated* cache buffers: XLA performs
the update in place on the donated memory, making this the functional
equivalent of the reference's in-place store — one HBM write per token,
no cache copy.

Semantics parity:
- slot -> (page = slot // page_size, entry = slot % page_size)
  (reference ``:66-68``)
- negative slots are padding and are dropped (reference ``:62-63``);
  implemented by clamping to an out-of-bounds index with scatter
  mode='drop'.
- fp8 cache: values are multiplied by the *inverted* scale before the
  dtype cast (reference ``:85-93``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import use_interpret_mode


def _stacked_write_kernel(
    meta_sm,  # scalar prefetch: (3, T) int32 [layer, page, entry] per token
    k_new_ref,  # (T, KH, D) VMEM
    v_new_ref,
    kc_in,  # (L, P, KH, ps, D) HBM (aliased to outputs)
    vc_in,
    kc_out,
    vc_out,
    kwin,  # (T, KH, 8, D) VMEM scratch
    vwin,
    sems,  # DMA (2, T)
    *,
    layer_arg: bool,
):
    """In-place token insertion into the stacked cache pool.

    XLA scatter into the (L, P, KH, ps, D) pool lowers pathologically
    (170 ms/step measured — tools/drive/exp_cache_scan.py), and Mosaic
    DMA cannot store a single sublane row (entry tiling is 8). So each
    token read-modify-writes its 8-entry aligned window: parallel window
    reads, an in-VMEM masked row insert, parallel write-backs. The caches
    are input_output_aliased — no pool copy, ~32 KB moved per token.

    HAZARD CONTRACT: at most one token per (page, 8-entry window) per
    call — guaranteed on the decode path (one token per sequence;
    sequences never share a write page). Prefill/verify use the per-layer
    scatter path instead.
    """
    t_total = k_new_ref.shape[0]
    layer = meta_sm[0, 0] if layer_arg else 0
    # Window = min(8, page_size): a full-dim slice is always legal; larger
    # pages use an 8-row (sublane-tile) aligned window.
    win = kwin.shape[2]

    reads = []
    for t in range(t_total):
        valid = meta_sm[1, t] >= 0
        page = jnp.maximum(meta_sm[1, t], 0)
        e8 = (meta_sm[2, t] // win) * win
        kcp = pltpu.make_async_copy(
            kc_out.at[layer, page, :, pl.ds(e8, win)], kwin.at[t], sems.at[0, t]
        )
        vcp = pltpu.make_async_copy(
            vc_out.at[layer, page, :, pl.ds(e8, win)], vwin.at[t], sems.at[1, t]
        )
        reads.append((valid, page, e8, kcp, vcp))
    for valid, _, _, kcp, vcp in reads:
        @pl.when(valid)
        def _(kcp=kcp, vcp=vcp):
            kcp.start()
            vcp.start()
    for valid, _, _, kcp, vcp in reads:
        @pl.when(valid)
        def _(kcp=kcp, vcp=vcp):
            kcp.wait()
            vcp.wait()

    # Insert each token's row at entry % win (masked select, no sublane slicing).
    kh, d = k_new_ref.shape[1], k_new_ref.shape[2]
    sub = jax.lax.broadcasted_iota(jnp.int32, (kh, win, d), 1)
    for t in range(t_total):
        off = meta_sm[2, t] - (meta_sm[2, t] // win) * win
        mask = sub == off
        kwin[t] = jnp.where(mask, k_new_ref[t][:, None, :], kwin[t])
        vwin[t] = jnp.where(mask, v_new_ref[t][:, None, :], vwin[t])

    writes = []
    for t, (valid, page, e8, _, _) in enumerate(reads):
        kcp = pltpu.make_async_copy(
            kwin.at[t], kc_out.at[layer, page, :, pl.ds(e8, win)], sems.at[0, t]
        )
        vcp = pltpu.make_async_copy(
            vwin.at[t], vc_out.at[layer, page, :, pl.ds(e8, win)], sems.at[1, t]
        )
        writes.append((valid, kcp, vcp))
    for valid, kcp, vcp in writes:
        @pl.when(valid)
        def _(kcp=kcp, vcp=vcp):
            kcp.start()
            vcp.start()
    for valid, kcp, vcp in writes:
        @pl.when(valid)
        def _(kcp=kcp, vcp=vcp):
            kcp.wait()
            vcp.wait()


@functools.partial(
    jax.jit, donate_argnums=(2, 3), static_argnames=("apply_fp8_scaling",)
)
def reshape_and_cache_stacked_launcher(
    key: jax.Array,
    value: jax.Array,
    key_caches: jax.Array,  # (L, P, KH, ps, D), DONATED
    value_caches: jax.Array,
    slot_mapping: jax.Array,
    layer_idx: jax.Array,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    *,
    apply_fp8_scaling: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """In-place token insertion into STACKED per-layer caches.

    Same semantics as :func:`reshape_and_cache_launcher` plus a traced
    ``layer_idx``; the caches are updated through pallas
    ``input_output_aliases`` so no copy of the pool is materialized even
    inside a ``lax.scan`` carry.
    """
    page_size = key_caches.shape[3]
    slots = slot_mapping.astype(jnp.int32)
    pages = jnp.where(slots >= 0, slots // page_size, -1)  # -1 = skip
    entries = jnp.where(slots >= 0, slots % page_size, 0)

    if apply_fp8_scaling:
        key = _quantize_store(key, k_scale, key_caches.dtype)
        value = _quantize_store(value, v_scale, value_caches.dtype)
    else:
        key = key.astype(key_caches.dtype)
        value = value.astype(value_caches.dtype)

    t = key.shape[0]
    meta = jnp.stack([
        jnp.full((t,), layer_idx.astype(jnp.int32).reshape(()), jnp.int32),
        pages,
        entries,
    ])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ),
        scratch_shapes=[
            pltpu.VMEM((t, key_caches.shape[2], min(8, page_size), key_caches.shape[4]), key_caches.dtype),
            pltpu.VMEM((t, value_caches.shape[2], min(8, page_size), value_caches.shape[4]), value_caches.dtype),
            pltpu.SemaphoreType.DMA((2, t)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_stacked_write_kernel, layer_arg=True),
        out_shape=(
            jax.ShapeDtypeStruct(key_caches.shape, key_caches.dtype),
            jax.ShapeDtypeStruct(value_caches.shape, value_caches.dtype),
        ),
        grid_spec=grid_spec,
        # operand index space includes the scalar-prefetch arg: meta=0,
        # key=1, value=2, key_caches=3, value_caches=4
        input_output_aliases={3: 0, 4: 1},
        interpret=use_interpret_mode(),
    )(meta, key, value, key_caches, value_caches)


def _quantize_store(x, scale, cache_dtype):
    scaled = x.astype(jnp.float32) * (1.0 / scale.astype(jnp.float32).reshape(()))
    if jnp.issubdtype(cache_dtype, jnp.integer):
        info = jnp.iinfo(cache_dtype)
        scaled = jnp.clip(jnp.round(scaled), info.min, info.max)
    else:
        # fp8 e4m3 has no inf: saturate instead of NaN on overflow.
        fmax = float(jnp.finfo(cache_dtype).max)
        scaled = jnp.clip(scaled, -fmax, fmax)
    return scaled.astype(cache_dtype)


@functools.partial(jax.jit, donate_argnums=(2, 3), static_argnames=("apply_fp8_scaling",))
def reshape_and_cache_launcher(
    key: jax.Array,
    value: jax.Array,
    key_cache: jax.Array,
    value_cache: jax.Array,
    slot_mapping: jax.Array,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    *,
    apply_fp8_scaling: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Insert new K/V token vectors into the paged caches.

    Args:
        key/value: (num_tokens, num_kv_heads, head_size).
        key_cache/value_cache: (num_pages, num_kv_heads, page_size, head_size);
            DONATED - callers must use the returned caches.
        slot_mapping: (num_tokens,) int32 cache slots (negative = skip).
        k_scale/v_scale: scalar fp8 scales (applied inverted on store).

    Returns:
        Updated (key_cache, value_cache).
    """
    num_pages = key_cache.shape[0]
    page_size = key_cache.shape[2]

    slots = slot_mapping.astype(jnp.int32)
    page_idx = jnp.where(slots >= 0, slots // page_size, num_pages)  # OOB -> dropped
    entry_idx = jnp.where(slots >= 0, slots % page_size, 0)

    if apply_fp8_scaling:

        def quantize(x, scale, cache_dtype):
            scaled = x.astype(jnp.float32) * (1.0 / scale.astype(jnp.float32).reshape(()))
            if jnp.issubdtype(cache_dtype, jnp.integer):
                info = jnp.iinfo(cache_dtype)
                scaled = jnp.clip(jnp.round(scaled), info.min, info.max)
            else:
                # fp8 e4m3 has no inf: saturate instead of NaN on overflow
                # (matches the CUDA saturating convert the reference uses).
                fmax = float(jnp.finfo(cache_dtype).max)
                scaled = jnp.clip(scaled, -fmax, fmax)
            return scaled.astype(cache_dtype)

        key = quantize(key, k_scale, key_cache.dtype)
        value = quantize(value, v_scale, value_cache.dtype)
    else:
        key = key.astype(key_cache.dtype)
        value = value.astype(value_cache.dtype)

    # Advanced indices at dims 0 and 2 with a slice between: result dims
    # are (tokens, kv_heads, head), matching the key/value layout.
    key_cache = key_cache.at[page_idx, :, entry_idx].set(key, mode="drop")
    value_cache = value_cache.at[page_idx, :, entry_idx].set(value, mode="drop")
    return key_cache, value_cache


@functools.partial(jax.jit, donate_argnums=(1,), static_argnames=("scale",))
def reshape_and_cache_mla_launcher(
    kv: jax.Array,
    kv_cache: jax.Array,
    slot_mapping: jax.Array,
    scale: float | None = None,
) -> jax.Array:
    """Insert packed MLA latent rows ``[c_kv | k_pe | pad]`` into the
    unified (num_pages, page_size, packed_dim) cache (vLLM
    ``concat_and_cache_mla`` equivalent; same slot/drop semantics as
    ``reshape_and_cache_launcher``). ``scale`` quantizes on store for
    int8/fp8 caches: stored = round(x / scale), saturating."""
    num_pages, page_size, _ = kv_cache.shape
    slots = slot_mapping.astype(jnp.int32)
    page_idx = jnp.where(slots >= 0, slots // page_size, num_pages)  # OOB -> dropped
    entry_idx = jnp.where(slots >= 0, slots % page_size, 0)
    if scale is not None:
        scaled = kv.astype(jnp.float32) * (1.0 / scale)
        if jnp.issubdtype(kv_cache.dtype, jnp.integer):
            info = jnp.iinfo(kv_cache.dtype)
            scaled = jnp.clip(jnp.round(scaled), info.min, info.max)
        else:
            # fp8 e4m3 has no inf: an unclamped overflow casts to NaN and
            # poisons every later attention read of the page. Saturate.
            fmax = float(jnp.finfo(kv_cache.dtype).max)
            scaled = jnp.clip(scaled, -fmax, fmax)
        kv = scaled
    return kv_cache.at[page_idx, entry_idx].set(kv.astype(kv_cache.dtype), mode="drop")
