# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU ring all-gather over ICI (inter-chip RDMA).

The hand-scheduled counterpart of ``parallel/collectives.ring_all_gather``:
each device pushes its chunk around the ring with
``pltpu.make_async_remote_copy`` double-buffered RDMA, writing received
chunks directly into the output buffer. Used to control collective
scheduling explicitly where XLA's generated all-gather can't overlap with
a consumer (e.g. ahead of a dequant-GEMM pipeline).

Status: compiled/validated on TPU hardware only (RDMA has no CPU
interpreter path); the lax-based ring in ``parallel/collectives`` is the
portable fallback and numerical reference.
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_all_gather_kernel(local_ref, out_ref, comm_buf, send_sem, recv_sem, *, axis_name: str):
    num_devices = jax.lax.axis_size(axis_name)
    my_id = jax.lax.axis_index(axis_name)
    chunk_rows = local_ref.shape[0]

    # Own chunk lands in its global slot.
    out_ref[pl.ds(my_id * chunk_rows, chunk_rows), :] = local_ref[...]
    comm_buf[0] = local_ref[...]

    def step(i, _):
        send_slot = i % 2
        recv_slot = (i + 1) % 2
        dst = (my_id + 1) % num_devices
        rdma = pltpu.make_async_remote_copy(
            src_ref=comm_buf.at[send_slot],
            dst_ref=comm_buf.at[recv_slot],
            send_sem=send_sem.at[send_slot],
            recv_sem=recv_sem.at[recv_slot],
            device_id=(dst,),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        rdma.wait()
        src_device = (my_id - i - 1) % num_devices
        out_ref[pl.ds(src_device * chunk_rows, chunk_rows), :] = comm_buf[recv_slot]
        return 0

    jax.lax.fori_loop(0, num_devices - 1, step, 0)


def ring_all_gather_pallas(x_shard: jax.Array, axis_name: str, num_devices: int) -> jax.Array:
    """All-gather ``x_shard`` (rows) across ``axis_name`` via Pallas RDMA.

    Must be called inside ``shard_map`` over a mesh whose ``axis_name``
    axis maps to an ICI ring. Returns the (num_devices * rows, cols)
    gathered array on every device.
    """
    rows, cols = x_shard.shape
    return pl.pallas_call(
        functools.partial(_ring_all_gather_kernel, axis_name=axis_name),
        out_shape=jax.ShapeDtypeStruct((num_devices * rows, cols), x_shard.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cols), x_shard.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=13,
        ),
    )(x_shard)
