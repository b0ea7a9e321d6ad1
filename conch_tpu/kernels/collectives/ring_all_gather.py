# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Pallas TPU ring all-gather over ICI (inter-chip RDMA).

The hand-scheduled counterpart of ``parallel/collectives.ring_all_gather``:
each device pushes chunks around the ring with
``pltpu.make_async_remote_copy`` RDMA. Used to control collective
scheduling explicitly where XLA's generated all-gather can't overlap with
a consumer (e.g. ahead of a dequant-GEMM pipeline).

Synchronization design (race-free by construction):

- Every chunk is forwarded *through its own output slot* — device ``d``
  at step ``i`` sends chunk ``(d - i) mod n`` from ``out[chunk]`` into the
  right neighbor's ``out[chunk]``. No communication slot is ever reused,
  so there is no buffer-capacity race regardless of ring skew (a
  double-buffered comm scratch, by contrast, is only safe up to one step
  of skew — with n >= 3 an upstream device running ahead can overwrite a
  slot still being read).
- Step ``i``'s send waits on ``recv_sems[i - 1]`` implicitly: the chunk a
  device forwards at step ``i`` is exactly the one its left neighbor's
  step ``i-1`` copy delivered, and ``rdma.wait()`` at each step waits for
  both the outbound send and the step's inbound chunk before advancing.
- A barrier with both ring neighbors runs before any RDMA so no device
  writes into a peer that has not yet entered the kernel.

Validated numerically on an 8-device ring in Pallas TPU interpret mode
(``tests/collectives_test.py::test_ring_all_gather_pallas_interpret``),
which simulates remote DMAs + semaphores per device; on hardware the same
kernel lowers via Mosaic (multi-chip ICI hardware was not available to
this build — single-chip rings are degenerate).
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ring_all_gather_kernel(local_ref, out_ref, send_sem, recv_sems, *, axis_name: str):
    num_devices = jax.lax.axis_size(axis_name)
    my_id = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my_id + 1, num_devices)
    left = jax.lax.rem(my_id + num_devices - 1, num_devices)

    # Entry barrier with both neighbors: no RDMA may target a device that
    # has not entered the kernel yet.
    barrier = pltpu.get_barrier_semaphore()
    pltpu.semaphore_signal(
        barrier, 1, device_id=left, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_signal(
        barrier, 1, device_id=right, device_id_type=pltpu.DeviceIdType.LOGICAL
    )
    pltpu.semaphore_wait(barrier, 2)

    # Own chunk lands in its global slot; it is step 0's forwarding source.
    out_ref[my_id] = local_ref[...]

    def step(i, carry):
        chunk = jax.lax.rem(my_id - i + num_devices, num_devices)
        rdma = pltpu.make_async_remote_copy(
            src_ref=out_ref.at[chunk],
            dst_ref=out_ref.at[chunk],
            send_sem=send_sem,
            recv_sem=recv_sems.at[i],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        rdma.start()
        # Waits the outbound send AND this step's inbound chunk (the left
        # neighbor's step-i copy into recv_sems[i]) — which is precisely
        # the chunk forwarded at step i+1.
        rdma.wait()
        return carry

    jax.lax.fori_loop(0, num_devices - 1, step, 0)


def ring_all_gather_pallas(
    x_shard: jax.Array, axis_name: str, num_devices: int, *, interpret=False
) -> jax.Array:
    """All-gather ``x_shard`` (rows) across ``axis_name`` via Pallas RDMA.

    Must be called inside ``shard_map`` over a mesh whose ``axis_name``
    axis maps to an ICI ring. Returns the (num_devices * rows, cols)
    gathered array on every device.

    ``interpret`` may be a ``pltpu.InterpretParams`` to run under the
    Pallas TPU interpreter (simulated RDMA on CPU devices, used by the
    test suite); on real TPU hardware leave it False.
    """
    rows, cols = x_shard.shape
    out = pl.pallas_call(
        functools.partial(_ring_all_gather_kernel, axis_name=axis_name),
        out_shape=jax.ShapeDtypeStruct((num_devices, rows, cols), x_shard.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((max(num_devices - 1, 1),)),
        ],
        compiler_params=pltpu.CompilerParams(
            has_side_effects=True,
            collective_id=13,
        ),
        interpret=interpret,
    )(x_shard)
    return out.reshape(num_devices * rows, cols)
