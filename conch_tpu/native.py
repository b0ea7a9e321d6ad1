# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""ctypes bindings to the native C++ extension (``conch_tpu_ext``).

Plays the role of the reference's CUDA extension import layer
(``conch/reference/vision/bev_pool.py:88-103``): env-gated
(``CONCH_ENABLE_CPP_EXT=1``) native baselines for the vision ops, plus the
native block allocator used by the serving runtime.

Build with ``make -C conch_tpu_ext`` (g++; see the Makefile).
"""

from __future__ import annotations

import ctypes
import functools
import pathlib

import numpy as np

_EXT_DIR = pathlib.Path(__file__).resolve().parent.parent / "conch_tpu_ext"
_LIB_PATH = _EXT_DIR / "libconch_tpu_ext.so"

_I32P = np.ctypeslib.ndpointer(dtype=np.int32, flags="C_CONTIGUOUS")
_F32P = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
_I64 = ctypes.c_int64
_F32 = ctypes.c_float


@functools.cache
def load_library() -> ctypes.CDLL:
    """Load (and type-annotate) the native library; raises if not built."""
    if not _LIB_PATH.exists():
        msg = f"Native extension not built: run `make -C {_EXT_DIR}`"
        raise FileNotFoundError(msg)
    lib = ctypes.CDLL(str(_LIB_PATH))

    lib.conch_bev_pool_forward.argtypes = [_F32P, _I32P, _I32P, _I32P, _I64, _I64, _I64, _I64, _I64, _F32P]
    lib.conch_bev_pool_forward.restype = None
    lib.conch_bev_pool_backward.argtypes = [_F32P, _I32P, _I32P, _I32P, _I64, _I64, _I64, _I64, _I64, _F32P]
    lib.conch_bev_pool_backward.restype = None

    lib.conch_voxelize.argtypes = [
        _F32P, _I64, _F32, _F32, _F32, _F32, _F32, _F32, _I64, _I64, _I64, _I64, _I64, _F32P, _I32P, _I32P,
    ]
    lib.conch_voxelize.restype = _I64

    lib.conch_allocator_create.argtypes = [_I64]
    lib.conch_allocator_create.restype = ctypes.c_void_p
    lib.conch_allocator_destroy.argtypes = [ctypes.c_void_p]
    lib.conch_allocator_num_free.argtypes = [ctypes.c_void_p]
    lib.conch_allocator_num_free.restype = _I64
    lib.conch_allocator_allocate.argtypes = [ctypes.c_void_p]
    lib.conch_allocator_allocate.restype = _I64
    lib.conch_allocator_free.argtypes = [ctypes.c_void_p, _I64]
    lib.conch_allocator_free.restype = _I64
    lib.conch_allocator_fork.argtypes = [ctypes.c_void_p, _I64]
    lib.conch_allocator_fork.restype = _I64
    lib.conch_allocator_refcount.argtypes = [ctypes.c_void_p, _I64]
    lib.conch_allocator_refcount.restype = _I64
    return lib


def is_available() -> bool:
    return _LIB_PATH.exists()


# -- vision baselines ------------------------------------------------------


def bev_pool_forward(
    image_feats: np.ndarray,
    geom_feats: np.ndarray,
    interval_starts: np.ndarray,
    interval_lengths: np.ndarray,
    batch_size: int,
    grid_z: int,
    grid_x: int,
    grid_y: int,
) -> np.ndarray:
    lib = load_library()
    feats = np.ascontiguousarray(image_feats, dtype=np.float32)
    channels = feats.shape[1]
    out = np.zeros((batch_size, grid_z, grid_x, grid_y, channels), dtype=np.float32)
    lib.conch_bev_pool_forward(
        feats,
        np.ascontiguousarray(geom_feats, dtype=np.int32),
        np.ascontiguousarray(interval_starts, dtype=np.int32),
        np.ascontiguousarray(interval_lengths, dtype=np.int32),
        len(interval_starts), channels, grid_z, grid_x, grid_y,
        out,
    )
    return out


def bev_pool_backward(
    grad_output: np.ndarray,
    geom_feats: np.ndarray,
    interval_starts: np.ndarray,
    interval_lengths: np.ndarray,
    num_points: int,
) -> np.ndarray:
    lib = load_library()
    grad = np.ascontiguousarray(grad_output, dtype=np.float32)
    _, grid_z, grid_x, grid_y, channels = grad.shape
    out = np.zeros((num_points, channels), dtype=np.float32)
    lib.conch_bev_pool_backward(
        grad,
        np.ascontiguousarray(geom_feats, dtype=np.int32),
        np.ascontiguousarray(interval_starts, dtype=np.int32),
        np.ascontiguousarray(interval_lengths, dtype=np.int32),
        len(interval_starts), channels, grid_z, grid_x, grid_y,
        out,
    )
    return out


def voxelize(
    points: np.ndarray,
    min_range,
    voxel_dim,
    grid_dim,
    max_points_per_voxel: int,
    max_num_voxels: int,
):
    lib = load_library()
    pts = np.ascontiguousarray(points, dtype=np.float32)
    feats = np.zeros((max_num_voxels, max_points_per_voxel, 4), dtype=np.float32)
    indices = np.zeros((max_num_voxels, 4), dtype=np.int32)
    counts = np.zeros((max_num_voxels,), dtype=np.int32)
    n = lib.conch_voxelize(
        pts, len(pts),
        min_range[0], min_range[1], min_range[2],
        voxel_dim[0], voxel_dim[1], voxel_dim[2],
        grid_dim[0], grid_dim[1], grid_dim[2],
        max_points_per_voxel, max_num_voxels,
        feats, indices, counts,
    )
    return int(n), feats, indices, counts


# -- native block allocator -----------------------------------------------


class NativeBlockAllocator:
    """ctypes wrapper over the C++ free-list/refcount allocator."""

    def __init__(self, num_pages: int) -> None:
        self._lib = load_library()
        self._handle = self._lib.conch_allocator_create(num_pages)
        self.num_pages = num_pages

    def __del__(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.conch_allocator_destroy(self._handle)
            self._handle = None

    @property
    def num_free(self) -> int:
        return self._lib.conch_allocator_num_free(self._handle)

    def allocate(self) -> int:
        page = self._lib.conch_allocator_allocate(self._handle)
        if page < 0:
            msg = "Out of KV-cache pages"
            raise MemoryError(msg)
        return page

    def can_allocate(self, n: int) -> bool:
        return self.num_free >= n

    def free(self, page: int) -> None:
        if self._lib.conch_allocator_free(self._handle, page) < 0:
            msg = f"double free of page {page}"
            raise AssertionError(msg)

    def fork(self, page: int) -> None:
        if self._lib.conch_allocator_fork(self._handle, page) < 0:
            msg = f"fork of unallocated page {page}"
            raise AssertionError(msg)

    def is_shared(self, page: int) -> bool:
        return self._lib.conch_allocator_refcount(self._handle, page) > 1

    def cow(self, page: int) -> tuple[int, bool]:
        if not self.is_shared(page):
            return page, False
        new_page = self.allocate()
        self._lib.conch_allocator_free(self._handle, page)
        return new_page, True
