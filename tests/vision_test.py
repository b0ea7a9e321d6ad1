# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Tests for the vision ops: BEVPool (fwd+bwd), NMS, voxelization.

Mirrors the reference's vision test strategy: BEVPool vs a loop-based
golden; NMS vs greedy golden; voxelization checked per-voxel (the
reference checks statistically because its atomics permute order —
our deterministic impl allows exact per-voxel set comparison).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conch_tpu.ops.vision import (
    VoxelizationParameter,
    bev_pool,
    bev_pool_backward,
    generate_voxels,
    nms,
)
from conch_tpu.reference.vision import reference as ref


def _make_bev_inputs(rng, num_intervals=20, max_len=6, channels=16, b=2, gz=1, gx=8, gy=8,
                     sort_cells=True):
    lengths = rng.integers(1, max_len + 1, size=num_intervals)
    starts = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
    n = int(lengths.sum())
    feats = rng.normal(size=(n, channels)).astype(np.float32)

    cells = rng.choice(b * gz * gx * gy, size=num_intervals, replace=False)
    if sort_cells:
        # BEVFusion builds intervals from points sorted by cell rank, so
        # interval cell ids arrive ascending — the realistic layout (and
        # the contract of the default cells_sorted=True fast path).
        cells = np.sort(cells)
    geom = np.zeros((n, 4), dtype=np.int32)
    for i, (s, ln) in enumerate(zip(starts, lengths)):
        cell = cells[i]
        bb, zz = cell // (gz * gx * gy), (cell // (gx * gy)) % gz
        xx, yy = (cell // gy) % gx, cell % gy
        geom[s : s + ln] = (xx, yy, zz, bb)
    return feats, geom, starts, lengths.astype(np.int32), (b, gz, gx, gy)


@pytest.mark.parametrize("sort_cells", [True, False])
def test_bev_pool_forward(rng, sort_cells):
    feats, geom, starts, lengths, (b, gz, gx, gy) = _make_bev_inputs(rng, sort_cells=sort_cells)
    out = bev_pool(
        jnp.asarray(feats), jnp.asarray(geom), jnp.asarray(starts), jnp.asarray(lengths), b, gz, gx, gy,
        cells_sorted=sort_cells,
    )
    expected = ref.bev_pool(feats, geom, starts, lengths, b, gz, gx, gy)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_bev_pool_forward_large_sorted(rng):
    """Window boundaries: >1 interval block, duplicate cells, long tails."""
    feats, geom, starts, lengths, dims = _make_bev_inputs(
        rng, num_intervals=700, max_len=9, channels=24, b=1, gz=1, gx=32, gy=32
    )
    # duplicate a few cells (scatter-ADD semantics must accumulate)
    geom2 = geom.copy()
    s1, l1 = starts[13], lengths[13]
    geom2[s1 : s1 + l1] = geom2[starts[14]][None, :]
    b, gz, gx, gy = dims
    out = bev_pool(
        jnp.asarray(feats), jnp.asarray(geom2), jnp.asarray(starts),
        jnp.asarray(lengths), b, gz, gx, gy, cells_sorted=True,
    )
    expected = ref.bev_pool(feats, geom2, starts, lengths, b, gz, gx, gy)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sort_cells", [True, False])
def test_bev_pool_backward(rng, sort_cells):
    feats, geom, starts, lengths, (b, gz, gx, gy) = _make_bev_inputs(rng, sort_cells=sort_cells)
    grad_out = rng.normal(size=(b, gz, gx, gy, feats.shape[1])).astype(np.float32)

    grads = bev_pool_backward(
        jnp.asarray(grad_out), jnp.asarray(geom), jnp.asarray(starts), jnp.asarray(lengths),
        cells_sorted=sort_cells,
    )
    expected = ref.bev_pool_backward(grad_out, geom, starts, lengths, feats.shape[0])
    np.testing.assert_allclose(np.asarray(grads), expected, rtol=1e-5, atol=1e-5)


def test_bev_pool_autodiff_matches_explicit_backward(rng):
    """jax.grad through bev_pool must equal the explicit backward op."""
    feats, geom, starts, lengths, (b, gz, gx, gy) = _make_bev_inputs(rng, num_intervals=8)

    def loss(f):
        return jnp.sum(
            bev_pool(f, jnp.asarray(geom), jnp.asarray(starts), jnp.asarray(lengths), b, gz, gx, gy) ** 2
        )

    g_auto = jax.grad(loss)(jnp.asarray(feats))
    out = bev_pool(jnp.asarray(feats), jnp.asarray(geom), jnp.asarray(starts), jnp.asarray(lengths), b, gz, gx, gy)
    g_explicit = bev_pool_backward(2 * out, jnp.asarray(geom), jnp.asarray(starts), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(g_auto), np.asarray(g_explicit), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_boxes", [1, 10, 100, 513])
@pytest.mark.parametrize("iou_threshold", [0.3, 0.7])
def test_nms(num_boxes, iou_threshold, rng):
    centers = rng.uniform(0, 100, size=(num_boxes, 2))
    sizes = rng.uniform(2, 20, size=(num_boxes, 2))
    boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2], axis=1).astype(np.float32)
    scores = rng.uniform(0, 1, size=num_boxes).astype(np.float32)

    keep = nms(jnp.asarray(boxes), jnp.asarray(scores), iou_threshold)
    expected = ref.nms(boxes, scores, iou_threshold)
    np.testing.assert_array_equal(np.asarray(keep), expected)


def test_nms_empty():
    keep = nms(jnp.zeros((0, 4)), jnp.zeros((0,)), 0.5)
    assert keep.shape == (0,)


def test_nms_identical_boxes(rng):
    """All-identical boxes: only the highest-scoring survives."""
    box = np.asarray([[0.0, 0.0, 10.0, 10.0]], dtype=np.float32)
    boxes = np.repeat(box, 5, axis=0)
    scores = np.asarray([0.1, 0.9, 0.5, 0.3, 0.7], dtype=np.float32)
    keep = nms(jnp.asarray(boxes), jnp.asarray(scores), 0.5)
    np.testing.assert_array_equal(np.asarray(keep), [1])


def test_voxelization(rng):
    param = VoxelizationParameter(
        min_range=(0.0, 0.0, 0.0),
        max_range=(8.0, 8.0, 4.0),
        voxel_dim=(1.0, 1.0, 1.0),
        max_num_points_per_voxel=4,
    )
    assert param.grid_dim == (8, 8, 4)

    # Points spread over the grid, some out of range.
    pts = rng.uniform(-1.0, 9.0, size=(200, 4)).astype(np.float32)
    num_filled, feats, indices, counts = generate_voxels(jnp.asarray(pts), param)

    golden = ref.voxelize(pts, param.min_range, param.voxel_dim, param.grid_dim, 4)
    nf = int(num_filled)
    assert nf == len(golden)

    feats = np.asarray(feats)
    indices = np.asarray(indices)
    counts = np.asarray(counts)
    gx, gy, _ = param.grid_dim

    # Deterministic ordering: voxels ascend by flat key.
    keys = [(int(z) * gy + int(y)) * gx + int(x) for x, y, z, _ in indices[:nf]]
    assert keys == sorted(golden.keys())

    for i, key in enumerate(keys):
        rows = golden[key]
        expected_count = min(len(rows), 4)
        assert counts[i] == expected_count
        # Points kept are the first max_pts in input order (stable sort).
        np.testing.assert_allclose(feats[i, :expected_count], pts[rows[:expected_count]], rtol=1e-6)
        # Padding rows are zero.
        assert np.all(feats[i, expected_count:] == 0)

    # Rows past num_filled are zero.
    assert np.all(feats[nf:] == 0)
    assert np.all(counts[nf:] == 0)


def test_voxelization_all_out_of_range(rng):
    param = VoxelizationParameter(
        min_range=(0.0, 0.0, 0.0), max_range=(4.0, 4.0, 4.0),
        voxel_dim=(1.0, 1.0, 1.0), max_num_points_per_voxel=2,
    )
    pts = np.full((10, 4), -5.0, dtype=np.float32)
    num_filled, feats, indices, counts = generate_voxels(jnp.asarray(pts), param)
    assert int(num_filled) == 0
    assert np.all(np.asarray(counts) == 0)


def test_voxelization_stable_and_collect(rng):
    """voxelization_stable + collect_point_features reproduce generate_voxels
    (parity: reference reference/vision/voxelization.py:108-334)."""
    from conch_tpu.ops.vision import collect_point_features, voxelization_stable

    param = VoxelizationParameter(
        min_range=(0.0, 0.0, 0.0),
        max_range=(8.0, 8.0, 4.0),
        voxel_dim=(1.0, 1.0, 1.0),
        max_num_points_per_voxel=4,
    )
    pts = rng.uniform(-1.0, 9.0, size=(300, 4)).astype(np.float32)

    counts, point_indices, flat_keys, num_filled = voxelization_stable(jnp.asarray(pts), param)
    golden = ref.voxelize(pts, param.min_range, param.voxel_dim, param.grid_dim, 10**9)
    nf = int(num_filled)
    assert nf == len(golden)

    counts = np.asarray(counts)
    point_indices = np.asarray(point_indices)
    flat_keys = np.asarray(flat_keys)

    # Ascending flat keys, UNCAPPED counts, grouped original indices.
    assert list(flat_keys[:nf]) == sorted(golden.keys())
    off = 0
    for i, key in enumerate(flat_keys[:nf]):
        rows = golden[int(key)]
        assert counts[i] == len(rows)
        assert list(point_indices[off : off + len(rows)]) == rows  # stable within voxel
        off += len(rows)
    assert np.all(counts[nf:] == 0)
    assert np.all(point_indices[off:] == pts.shape[0])  # sentinel padding

    feats, capped = collect_point_features(jnp.asarray(pts), jnp.asarray(counts), jnp.asarray(point_indices), param)
    # Must match the dense path (which caps at max_num_points_per_voxel).
    _, dense_feats, _, dense_counts = generate_voxels(jnp.asarray(pts), param)
    np.testing.assert_array_equal(np.asarray(capped), np.asarray(dense_counts))
    np.testing.assert_allclose(np.asarray(feats), np.asarray(dense_feats, dtype=np.float32), rtol=1e-6)
