# Copyright 2026 Conch-TPU authors.
# SPDX-License-Identifier: Apache-2.0

"""Paged KV-cache block allocator with copy-on-write refcounts.

The host-side memory manager for the serving engine (the component vLLM
implements in C++; a C-extension backend is provided in ``conch_tpu_ext``
and used automatically when built — see ``CONCH_ENABLE_CPP_EXT``).
Free-list allocation, per-page refcounts for forked sequences (beam
search), and copy-on-write resolution feeding ``copy_blocks``.
"""

from __future__ import annotations


class BlockAllocator:
    """Free-list page allocator with refcounting."""

    def __init__(self, num_pages: int) -> None:
        self.num_pages = num_pages
        self._free: list[int] = list(range(num_pages - 1, -1, -1))
        self._refcount = [0] * num_pages

    @property
    def num_free(self) -> int:
        return len(self._free)

    def allocate(self) -> int:
        """Allocate one page (refcount 1). Raises if exhausted."""
        if not self._free:
            msg = "Out of KV-cache pages"
            raise MemoryError(msg)
        page = self._free.pop()
        self._refcount[page] = 1
        return page

    def can_allocate(self, n: int) -> bool:
        return len(self._free) >= n

    def free(self, page: int) -> None:
        """Drop one reference; page returns to the free list at zero."""
        assert self._refcount[page] > 0, f"double free of page {page}"
        self._refcount[page] -= 1
        if self._refcount[page] == 0:
            self._free.append(page)

    def fork(self, page: int) -> None:
        """Share a page (copy-on-write): bump its refcount."""
        assert self._refcount[page] > 0
        self._refcount[page] += 1

    def is_shared(self, page: int) -> bool:
        return self._refcount[page] > 1

    def cow(self, page: int) -> tuple[int, bool]:
        """Resolve copy-on-write before writing to ``page``.

        Returns (writable_page, needs_copy): if the page is shared, a fresh
        page is allocated and the caller must schedule a ``copy_blocks``
        of page -> writable_page.
        """
        if not self.is_shared(page):
            return page, False
        new_page = self.allocate()
        self._refcount[page] -= 1
        return new_page, True
