# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for the native C++ extension vs the TPU/jnp implementations.

Mirrors the reference's CUDA-ext gating (``CONCH_ENABLE_CUDA_EXT``): tests
skip when the extension isn't built.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu import native

pytestmark = pytest.mark.skipif(not native.is_available(), reason="native ext not built")


def test_native_bev_pool_matches_jnp(rng):
    from tests.vision_test import _make_bev_inputs
    from conch_tpu.ops.vision import bev_pool, bev_pool_backward

    feats, geom, starts, lengths, (b, gz, gx, gy) = _make_bev_inputs(rng)
    native_out = native.bev_pool_forward(feats, geom, starts, lengths, b, gz, gx, gy)
    jnp_out = bev_pool(jnp.asarray(feats), jnp.asarray(geom), jnp.asarray(starts), jnp.asarray(lengths), b, gz, gx, gy)
    np.testing.assert_allclose(native_out, np.asarray(jnp_out), rtol=1e-5, atol=1e-5)

    grad = rng.normal(size=native_out.shape).astype(np.float32)
    native_grad = native.bev_pool_backward(grad, geom, starts, lengths, feats.shape[0])
    jnp_grad = bev_pool_backward(jnp.asarray(grad), jnp.asarray(geom), jnp.asarray(starts), jnp.asarray(lengths))
    np.testing.assert_allclose(native_grad, np.asarray(jnp_grad), rtol=1e-5, atol=1e-5)


def test_native_voxelize_matches_jnp(rng):
    from conch_tpu.ops.vision import VoxelizationParameter, generate_voxels

    param = VoxelizationParameter((0.0, 0.0, 0.0), (8.0, 8.0, 4.0), (1.0, 1.0, 1.0), 4)
    pts = rng.uniform(-1, 9, size=(300, 4)).astype(np.float32)

    n_native, feats_n, idx_n, counts_n = native.voxelize(
        pts, param.min_range, param.voxel_dim, param.grid_dim, 4, param.max_num_voxels
    )
    n_jnp, feats_j, idx_j, counts_j = generate_voxels(jnp.asarray(pts), param)

    assert n_native == int(n_jnp)
    np.testing.assert_array_equal(idx_n[:n_native], np.asarray(idx_j)[:n_native])
    np.testing.assert_array_equal(counts_n[:n_native], np.asarray(counts_j)[:n_native])
    np.testing.assert_allclose(feats_n[:n_native], np.asarray(feats_j)[:n_native], rtol=1e-6)


def test_native_allocator_semantics():
    from conch_tpu.serving.block_allocator import BlockAllocator

    for alloc in (native.NativeBlockAllocator(8), BlockAllocator(8)):
        pages = [alloc.allocate() for _ in range(8)]
        assert sorted(pages) == list(range(8))
        assert alloc.num_free == 0
        with pytest.raises(MemoryError):
            alloc.allocate()

        alloc.fork(pages[0])
        assert alloc.is_shared(pages[0])
        unshared, copied = alloc.cow(pages[3])
        assert unshared == pages[3] and not copied  # exclusive page: no copy
        alloc.free(pages[1])
        assert alloc.num_free == 1
        w2, need_copy = alloc.cow(pages[0])
        assert need_copy and w2 != pages[0]
        assert not alloc.is_shared(pages[0])


def test_allocator_fork_of_freed_page_raises():
    """Regression: forking a freed page must fail loudly in BOTH backends
    (the C++ allocator used to silently resurrect the page while it was
    still on the free list, letting two requests share one KV page)."""
    from conch_tpu.serving.block_allocator import BlockAllocator

    for alloc in (native.NativeBlockAllocator(4), BlockAllocator(4)):
        page = alloc.allocate()
        alloc.free(page)
        with pytest.raises(AssertionError):
            alloc.fork(page)
        assert alloc.num_free == 4  # free list unchanged by the failed fork
