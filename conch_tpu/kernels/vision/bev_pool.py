# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""BEVPool: interval sum-pooling onto a 3D voxel grid, with custom VJP.

TPU-native re-design of the reference Triton kernels
(``conch/kernels/vision/bev_pool.py:238-329``, BEVFusion "quick cumsum"
lineage). Geometry convention (reference ``bev_pool.py:108-124``):
``geom_feats[:, 0..3] = (x, y, z, batch)``; output layout
``(batch, grid_z, grid_x, grid_y, channels)``.

Two implementations:

- **Sorted fast path** (``cells_sorted=True``, Pallas): the BEVFusion
  pipeline builds intervals from points sorted by cell rank, so interval
  cell ids arrive ascending and interval point ranges are contiguous.
  That structure turns both the data-dependent gather (points -> interval
  sums) and the scatter (interval sums -> grid cells) into *windowed
  one-hot contractions on the MXU*: each grid step manually DMAs a
  bounded window of rows, builds a 0/1 membership mask by comparing
  indices (VPU), and contracts mask @ rows (MXU). No atomics, no
  per-element scatter — every HBM access is a large sequential window.
  Scatter-ADD semantics (duplicate cells accumulate), so it is exact for
  any sorted input, not just unique cells.
- **XLA fallback** (``cells_sorted=False``): ``searchsorted`` +
  ``segment_sum`` + scatter-add. Correct for arbitrary interval order,
  but XLA lowers the row scatter/gather to serial loops on TPU — use
  only when the sorted contract cannot be guaranteed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from conch_tpu.kernels.common import round_up, use_interpret_mode

# Window/block sizes (all multiples of the (8,128) f32 tile):
_BI = 256  # intervals per grid step (sums / grad_sums kernels)
_WP = 512  # point-window rows per DMA chunk
_BC = 256  # grid cells per output block (placement kernel)
_WI = 256  # interval-window rows per DMA chunk (placement / grad_points)
_GW = 512  # grid-row window per DMA chunk (grad_sums kernel)
_PB = 512  # points per output block (grad_points kernel)


def _flat_cells(geom_feats, interval_starts, grid_cells_z, grid_cells_x, grid_cells_y):
    """Flattened output-cell id per interval, from each interval's first point.

    One small row gather (num_intervals x 4 ints); everything bulky stays
    in the Pallas kernels.
    """
    first = jnp.take(geom_feats, interval_starts.astype(jnp.int32), axis=0)
    return (
        ((first[:, 3] * grid_cells_z + first[:, 2]) * grid_cells_x + first[:, 0])
        * grid_cells_y
        + first[:, 1]
    ).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Kernel 1: per-interval sums.  grid step = _BI intervals; the step's points
# live in the contiguous range [starts[i0], ends[i0+_BI-1]) (sorted contract),
# streamed through VMEM in _WP-row DMA windows.
# ---------------------------------------------------------------------------



def _exact_mask_dot(mask: jax.Array, vals: jax.Array) -> jax.Array:
    """``mask @ vals`` exactly, with f32 values, on the bf16 MXU.

    Mosaic supports only DEFAULT (1-pass bf16) and HIGHEST (6-pass) dot
    precisions; DEFAULT rounds the f32 values to bf16 (~0.4% rel error)
    and HIGHEST pays 6 passes. Since the mask side is 0/1 (bf16-exact),
    splitting the VALUE side into three bf16 terms (8+8+8 = 24 mantissa
    bits) gives full f32 fidelity in 3 passes:
    ``mask @ v = mask @ v0 + mask @ v1 + mask @ v2``.
    bf16 values take the single-dot fast path.
    """
    m = mask.astype(jnp.bfloat16)

    def dot(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    if vals.dtype == jnp.bfloat16:
        return dot(m, vals)
    v = vals.astype(jnp.float32)
    v0 = v.astype(jnp.bfloat16)
    r1 = v - v0.astype(jnp.float32)
    v1 = r1.astype(jnp.bfloat16)
    v2 = (r1 - v1.astype(jnp.float32)).astype(jnp.bfloat16)
    return dot(m, v0) + dot(m, v1) + dot(m, v2)


def _interval_sums_kernel(
    starts_sm, ends_sm,  # scalar-prefetch (NIpad,)
    starts_ref, ends_ref,  # (_BI, 1) VMEM blocks
    feats_hbm,  # (Npad, C) in ANY (stays in HBM)
    sums_ref,  # out (_BI, C)
    pts, acc, sem,
    *, wp: int,
):
    i0 = pl.program_id(0) * starts_ref.shape[0]
    pstart = starts_sm[i0]
    pend = ends_sm[i0 + starts_ref.shape[0] - 1]
    nchunks = pl.cdiv(jnp.maximum(pend - pstart, 0), wp)

    acc[...] = jnp.zeros_like(acc)
    starts_v = starts_ref[...]  # (_BI, 1)
    ends_v = ends_ref[...]

    def chunk(c, _):
        off = pstart + c * wp
        copy = pltpu.make_async_copy(feats_hbm.at[pl.ds(off, wp), :], pts, sem)
        copy.start()
        copy.wait()
        # membership mask over (interval, point): exact 0/1 in any dtype
        pidx = jax.lax.broadcasted_iota(jnp.int32, (starts_v.shape[0], wp), 1) + off
        mask = (pidx >= starts_v) & (pidx < ends_v)
        acc[...] += _exact_mask_dot(mask, pts[...])
        return 0

    jax.lax.fori_loop(0, nchunks, chunk, 0)
    sums_ref[...] = acc[...].astype(sums_ref.dtype)


def _interval_sums(feats, starts, ends, ni_pad):
    """(NIpad, C) per-interval sums via the windowed one-hot kernel."""
    n, c = feats.shape
    feats_pad = jnp.pad(feats, ((0, _WP), (0, 0)))
    pad_i = ni_pad - starts.shape[0]
    # Padded intervals: empty range at the end of the real points.
    starts_p = jnp.pad(starts, (0, pad_i), constant_values=n)
    ends_p = jnp.pad(ends, (0, pad_i), constant_values=n)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ni_pad // _BI,),
        in_specs=[
            pl.BlockSpec((_BI, 1), lambda i, s0, s1: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_BI, 1), lambda i, s0, s1: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((_BI, c), lambda i, s0, s1: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_WP, c), feats.dtype),
            pltpu.VMEM((_BI, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_interval_sums_kernel, wp=_WP),
        out_shape=jax.ShapeDtypeStruct((ni_pad, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=use_interpret_mode(),
    )(starts_p, ends_p, starts_p.reshape(-1, 1), ends_p.reshape(-1, 1), feats_pad)


# ---------------------------------------------------------------------------
# Kernel 2: grid placement.  grid step = _BC output cells; the intervals
# landing in the block are rows [lo_g, hi_g) of the (cell-sorted) sums.
# ---------------------------------------------------------------------------


def _placement_kernel(
    lo_sm, hi_sm,  # scalar-prefetch (num_blocks,)
    cells_hbm,  # (1, NIpad2) int32 in HBM (row vector: lane-aligned windows)
    sums_hbm,  # (NIpad2, C) f32 in HBM
    out_ref,  # (_BC, C)
    cwin, swin, acc, sems,
    *, wi: int,
):
    g = pl.program_id(0)
    # Lane-dim DMA starts must be 128-aligned: align the window down. The
    # extra leading intervals cannot match this block's cells (mask is an
    # equality on cell id), so over-coverage is harmless.
    lo = (lo_sm[g] // wi) * wi
    hi = hi_sm[g]
    base = g * out_ref.shape[0]
    nchunks = pl.cdiv(jnp.maximum(hi - lo, 0), wi)

    acc[...] = jnp.zeros_like(acc)

    def chunk(c, _):
        off = lo + c * wi
        off = pl.multiple_of(off, 128)
        cp1 = pltpu.make_async_copy(cells_hbm.at[:, pl.ds(off, wi)], cwin, sems.at[0])
        cp2 = pltpu.make_async_copy(sums_hbm.at[pl.ds(off, wi), :], swin, sems.at[1])
        cp1.start()
        cp2.start()
        cp1.wait()
        cp2.wait()
        # mask[r, w] = (interval w's cell == base + r) and w within [lo, hi);
        # cwin is a (1, wi) row vector so both compares broadcast over dim0.
        riota = jax.lax.broadcasted_iota(jnp.int32, (acc.shape[0], wi), 0)
        widx = jax.lax.broadcasted_iota(jnp.int32, (acc.shape[0], wi), 1) + off
        mask = ((cwin[...] - base) == riota) & (widx < hi)
        acc[...] += _exact_mask_dot(mask, swin[...])
        return 0

    jax.lax.fori_loop(0, nchunks, chunk, 0)
    # acc is lane-padded (cp >= 128); the output block may be narrower
    # (true channel count) — BlockSpec stores handle non-128 minors.
    out_ref[...] = acc[:, : out_ref.shape[1]].astype(out_ref.dtype)


def _place_on_grid(sums, cells, num_cells, out_dtype, out_channels=None):
    """Scatter-add sorted (NIpad, Cp) interval sums onto (NCpad, C) grid rows."""
    ni_pad, c = sums.shape
    out_c = out_channels or c
    nc_pad = round_up(num_cells, _BC)
    num_blocks = nc_pad // _BC
    # Window DMAs may run past the last interval: pad by one window. Padded
    # cells repeat the last real cell but their widx >= hi masks them out;
    # padded sums are zero anyway.
    cells_p = jnp.pad(cells, (0, _WI), mode="edge").reshape(1, -1)
    sums_p = jnp.pad(sums, ((0, _WI), (0, 0)))

    bounds = jnp.arange(num_blocks + 1, dtype=jnp.int32) * _BC
    edges = jnp.searchsorted(cells, bounds, side="left").astype(jnp.int32)
    lo, hi = edges[:-1], edges[1:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((_BC, out_c), lambda g, s0, s1: (g, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, _WI), jnp.int32),
            pltpu.VMEM((_WI, c), jnp.float32),
            pltpu.VMEM((_BC, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_placement_kernel, wi=_WI),
        out_shape=jax.ShapeDtypeStruct((nc_pad, out_c), out_dtype),
        grid_spec=grid_spec,
        interpret=use_interpret_mode(),
    )(lo, hi, cells_p, sums_p)
    return out[:num_cells]


# ---------------------------------------------------------------------------
# Backward kernels.
# ---------------------------------------------------------------------------


def _grad_sums_kernel(
    clo_sm, chi_sm,  # scalar-prefetch: first/last cell id per interval block
    cells_ref,  # (_BI, 1) VMEM block
    grid_hbm,  # (NCpad, C) in ANY
    gsums_ref,  # out (_BI, C)
    gwin, acc, sem,
    *, gw: int,
):
    i = pl.program_id(0)
    cell_lo = clo_sm[i]
    cell_hi = chi_sm[i]
    nchunks = pl.cdiv(jnp.maximum(cell_hi - cell_lo + 1, 0), gw)

    acc[...] = jnp.zeros_like(acc)
    cells_v = cells_ref[...]  # (_BI, 1)

    def chunk(c, _):
        off = cell_lo + c * gw
        copy = pltpu.make_async_copy(grid_hbm.at[pl.ds(off, gw), :], gwin, sem)
        copy.start()
        copy.wait()
        # mask[i_local, r] = (cells[i_local] == off + r): gather grid row
        ridx = jax.lax.broadcasted_iota(jnp.int32, (cells_v.shape[0], gw), 1) + off
        acc[...] += _exact_mask_dot(cells_v == ridx, gwin[...])
        return 0

    jax.lax.fori_loop(0, nchunks, chunk, 0)
    gsums_ref[...] = acc[...]


def _grad_points_kernel(
    ilo_sm, ihi_sm,  # scalar-prefetch: interval window per point block
    starts_hbm, ends_hbm,  # (1, NIpad2) int32 in HBM (row vectors)
    gsums_hbm,  # (NIpad2, C) f32 in HBM
    gpts_ref,  # out (_PB, C)
    swin, ewin, gwin, acc, sems,
    *, wi: int,
):
    b = pl.program_id(0)
    p0 = b * gpts_ref.shape[0]
    # Align the interval window down to the lane tiling (see placement
    # kernel): earlier intervals end before this point block, so the
    # containment mask zeroes them.
    lo = (ilo_sm[b] // wi) * wi
    hi = ihi_sm[b]
    nchunks = pl.cdiv(jnp.maximum(hi - lo, 0), wi)

    acc[...] = jnp.zeros_like(acc)

    def chunk(c, _):
        off = lo + c * wi
        off = pl.multiple_of(off, 128)
        cps = [
            pltpu.make_async_copy(starts_hbm.at[:, pl.ds(off, wi)], swin, sems.at[0]),
            pltpu.make_async_copy(ends_hbm.at[:, pl.ds(off, wi)], ewin, sems.at[1]),
            pltpu.make_async_copy(gsums_hbm.at[pl.ds(off, wi), :], gwin, sems.at[2]),
        ]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()
        # mask[p, w] = interval w contains absolute point p0 + p; the
        # (1, wi) start/end row vectors broadcast over the point dim.
        pabs = jax.lax.broadcasted_iota(jnp.int32, (acc.shape[0], wi), 0) + p0
        mask = (pabs >= swin[...]) & (pabs < ewin[...])
        acc[...] += _exact_mask_dot(mask, gwin[...])
        return 0

    jax.lax.fori_loop(0, nchunks, chunk, 0)
    gpts_ref[...] = acc[:, : gpts_ref.shape[1]].astype(gpts_ref.dtype)


# ---------------------------------------------------------------------------
# Launchers.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=("batch_size", "grid_cells_z", "grid_cells_x", "grid_cells_y"),
)
def _bev_pool_sorted_impl(
    image_feats, geom_feats, interval_starts, interval_lengths,
    batch_size, grid_cells_z, grid_cells_x, grid_cells_y,
):
    c = image_feats.shape[1]
    # Mosaic DMA slices need a 128-aligned minor dim: lane-pad channels.
    cp = round_up(c, 128)
    if cp != c:
        image_feats = jnp.pad(image_feats, ((0, 0), (0, cp - c)))
    ni = interval_starts.shape[0]
    ni_pad = round_up(ni, _BI)
    starts = interval_starts.astype(jnp.int32)
    ends = starts + interval_lengths.astype(jnp.int32)

    sums = _interval_sums(image_feats, starts, ends, ni_pad)  # (NIpad, Cp) f32
    cells = _flat_cells(geom_feats, starts, grid_cells_z, grid_cells_x, grid_cells_y)
    cells = jnp.pad(cells, (0, ni_pad - ni), mode="edge")  # padded sums are 0

    num_cells = batch_size * grid_cells_z * grid_cells_x * grid_cells_y
    out = _place_on_grid(sums, cells, num_cells, image_feats.dtype, out_channels=c)
    return out.reshape(batch_size, grid_cells_z, grid_cells_x, grid_cells_y, c)


@functools.partial(jax.jit, static_argnames=("num_points",))
def _bev_pool_backward_sorted_impl(
    grad_output, geom_feats, interval_starts, interval_lengths, num_points,
):
    grad_flat = grad_output.reshape(-1, grad_output.shape[-1]).astype(jnp.float32)
    nc, c = grad_flat.shape
    cp = round_up(c, 128)  # Mosaic DMA slices need a 128-aligned minor dim
    if cp != c:
        grad_flat = jnp.pad(grad_flat, ((0, 0), (0, cp - c)))
    ni = interval_starts.shape[0]
    ni_pad = round_up(ni, _BI)
    starts = interval_starts.astype(jnp.int32)
    ends = starts + interval_lengths.astype(jnp.int32)

    gz, gx, gy = grad_output.shape[1], grad_output.shape[2], grad_output.shape[3]
    cells = _flat_cells(geom_feats, starts, gz, gx, gy)
    cells_p = jnp.pad(cells, (0, ni_pad - ni), mode="edge")

    # grad_sums[i] = grad_grid[cells[i]]  (windowed row gather)
    grid_pad = jnp.pad(grad_flat, ((0, _GW), (0, 0)))
    blocked = cells_p.reshape(ni_pad // _BI, _BI)
    clo, chi = blocked[:, 0], blocked[:, -1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ni_pad // _BI,),
        in_specs=[
            pl.BlockSpec((_BI, 1), lambda i, s0, s1: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((_BI, cp), lambda i, s0, s1: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((_GW, cp), jnp.float32),
            pltpu.VMEM((_BI, cp), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    grad_sums = pl.pallas_call(
        functools.partial(_grad_sums_kernel, gw=_GW),
        out_shape=jax.ShapeDtypeStruct((ni_pad, cp), jnp.float32),
        grid_spec=grid_spec,
        interpret=use_interpret_mode(),
    )(clo, chi, cells_p.reshape(-1, 1), grid_pad)

    # grad_points[p] = grad_sums[interval containing p]  (windowed broadcast)
    np_pad = round_up(num_points, _PB)
    pad_i = ni_pad - ni
    starts_p = jnp.pad(starts, (0, pad_i), constant_values=num_points)
    ends_p = jnp.pad(ends, (0, pad_i), constant_values=num_points)
    pbounds = jnp.arange(np_pad // _PB + 1, dtype=jnp.int32) * _PB
    # intervals possibly overlapping point block [p0, p0+_PB): those with
    # start < p0+_PB and end > p0 — a contiguous index range when sorted.
    ilo = (
        jnp.searchsorted(ends.astype(jnp.int32), pbounds[:-1], side="right")
        .astype(jnp.int32)
    )
    ihi = jnp.searchsorted(starts, pbounds[1:], side="left").astype(jnp.int32)

    starts_pad2 = jnp.pad(starts_p, (0, _WI), constant_values=num_points).reshape(1, -1)
    ends_pad2 = jnp.pad(ends_p, (0, _WI), constant_values=num_points).reshape(1, -1)
    gsums_pad = jnp.pad(grad_sums, ((0, _WI), (0, 0)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(np_pad // _PB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((_PB, c), lambda b, s0, s1: (b, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((1, _WI), jnp.int32),
            pltpu.VMEM((1, _WI), jnp.int32),
            pltpu.VMEM((_WI, cp), jnp.float32),
            pltpu.VMEM((_PB, cp), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    grad_points = pl.pallas_call(
        functools.partial(_grad_points_kernel, wi=_WI),
        out_shape=jax.ShapeDtypeStruct((np_pad, c), grad_output.dtype),
        grid_spec=grid_spec,
        interpret=use_interpret_mode(),
    )(ilo, ihi, starts_pad2, ends_pad2, gsums_pad)
    return grad_points[:num_points]


# ---------------------------------------------------------------------------
# XLA fallback (arbitrary interval order).
# ---------------------------------------------------------------------------


def _point_interval_ids(interval_starts: jax.Array, interval_lengths: jax.Array, num_points: int):
    """Label each point with its interval id (mask for points outside any)."""
    point_ids = jnp.arange(num_points, dtype=jnp.int32)
    seg = jnp.searchsorted(interval_starts.astype(jnp.int32), point_ids, side="right").astype(jnp.int32) - 1
    seg = jnp.clip(seg, 0, interval_starts.shape[0] - 1)
    within = (point_ids >= interval_starts[seg]) & (point_ids < interval_starts[seg] + interval_lengths[seg])
    return seg, within


@functools.partial(jax.jit, static_argnames=("batch_size", "grid_cells_z", "grid_cells_x", "grid_cells_y"))
def _bev_pool_xla_impl(
    image_feats, geom_feats, interval_starts, interval_lengths,
    batch_size, grid_cells_z, grid_cells_x, grid_cells_y,
):
    num_points = image_feats.shape[0]
    num_intervals = interval_starts.shape[0]

    seg, within = _point_interval_ids(interval_starts, interval_lengths, num_points)
    masked = jnp.where(within[:, None], image_feats, 0)
    sums = jax.ops.segment_sum(masked, seg, num_segments=num_intervals)  # (n_int, C)

    first = geom_feats[interval_starts.astype(jnp.int32)]  # (n_int, 4): x, y, z, b
    out = jnp.zeros(
        (batch_size, grid_cells_z, grid_cells_x, grid_cells_y, image_feats.shape[1]),
        dtype=image_feats.dtype,
    )
    return out.at[first[:, 3], first[:, 2], first[:, 0], first[:, 1]].add(sums, mode="drop")


@functools.partial(jax.jit, static_argnames=("num_points",))
def _bev_pool_backward_xla_impl(
    grad_output, geom_feats, interval_starts, interval_lengths, num_points,
):
    seg, within = _point_interval_ids(interval_starts, interval_lengths, num_points)
    first = geom_feats[interval_starts.astype(jnp.int32)]
    per_interval = grad_output[first[:, 3], first[:, 2], first[:, 0], first[:, 1]]  # (n_int, C)
    grads = per_interval[seg]
    return jnp.where(within[:, None], grads, 0)


# ---------------------------------------------------------------------------
# Public entry points (custom VJP).
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def bev_pool(
    image_feats: jax.Array,
    geom_feats: jax.Array,
    interval_starts,
    interval_lengths,
    batch_size: int,
    grid_cells_z: int,
    grid_cells_x: int,
    grid_cells_y: int,
    cells_sorted: bool = True,
) -> jax.Array:
    """Sum image features within each interval and scatter to the BEV grid.

    Args:
        image_feats: (num_points, channels).
        geom_feats: (num_points, 4) int (x, y, z, batch) per point.
        interval_starts/interval_lengths: (num_intervals,) run-length
            encoding of points sharing a grid cell.
        batch_size, grid_cells_z/x/y: output grid dimensions.
        cells_sorted: intervals arrive in ascending flattened-cell order
            (the BEVFusion quick-cumsum construction guarantees this: it
            sorts points by cell rank before deriving intervals). Enables
            the windowed Pallas path; pass False for arbitrary order to
            use the XLA fallback.

    Returns:
        (batch, grid_z, grid_x, grid_y, channels) pooled features.
    """
    return _bev_pool_fwd_impl(
        image_feats, geom_feats, interval_starts, interval_lengths,
        batch_size, grid_cells_z, grid_cells_x, grid_cells_y, cells_sorted,
    )


def _bev_pool_fwd_impl(
    image_feats, geom_feats, interval_starts, interval_lengths,
    batch_size, grid_cells_z, grid_cells_x, grid_cells_y, cells_sorted,
):
    impl = _bev_pool_sorted_impl if cells_sorted else _bev_pool_xla_impl
    return impl(
        image_feats, geom_feats, interval_starts, interval_lengths,
        batch_size, grid_cells_z, grid_cells_x, grid_cells_y,
    )


def _bev_pool_fwd(image_feats, geom_feats, interval_starts, interval_lengths, b, z, x, y, cells_sorted):
    out = _bev_pool_fwd_impl(
        image_feats, geom_feats, interval_starts, interval_lengths, b, z, x, y, cells_sorted
    )
    return out, (geom_feats, image_feats.shape[0])


def _bev_pool_bwd(interval_starts, interval_lengths, b, z, x, y, cells_sorted, residuals, grad_output):
    geom_feats, num_points = residuals
    grad_points = bev_pool_backward(
        grad_output, geom_feats, interval_starts, interval_lengths, num_points,
        cells_sorted=cells_sorted,
    )
    return grad_points, None


def bev_pool_backward(
    grad_output: jax.Array,
    geom_feats: jax.Array,
    interval_starts: jax.Array,
    interval_lengths: jax.Array,
    num_points: int,
    cells_sorted: bool = True,
) -> jax.Array:
    """Gradient wrt image features: broadcast each cell's grad to its points."""
    impl = _bev_pool_backward_sorted_impl if cells_sorted else _bev_pool_backward_xla_impl
    return impl(grad_output, geom_feats, interval_starts, interval_lengths, num_points)


bev_pool.defvjp(_bev_pool_fwd, _bev_pool_bwd)
