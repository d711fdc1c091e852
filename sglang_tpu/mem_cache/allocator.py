"""Host-side KV page allocator with reference counting.

Parity with reference `srt/mem_cache/allocator.py` (`TokenToKVPoolAllocator:121`,
`PagedTokenToKVPoolAllocator:362`). TPU design: allocation is page-granular
only (pages are the DMA unit of the Pallas attention kernel), and pages are
reference-counted so the radix prefix cache can share pages between requests
(the reference splits this between allocator free-lists and radix lock-refs;
fusing refcounts into the allocator keeps eviction and retraction simple).

Page 0 is reserved as the garbage page: padded tokens in a bucketed batch
write their KV there.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class PageAllocator:
    def __init__(self, num_pages: int, page_size: int):
        assert num_pages > 1
        self.num_pages = num_pages
        self.page_size = page_size
        # LIFO free list of page ids (1..num_pages-1); page 0 reserved.
        self._free: List[int] = list(range(num_pages - 1, 0, -1))
        self._ref = np.zeros(num_pages, dtype=np.int32)
        self._ref[0] = 1  # garbage page permanently held
        # Optional eviction hook: called with the page shortfall before an
        # alloc fails, so the radix cache can LRU-evict into the free list
        # (reference interleaves this in `PrefillAdder` / `evict` calls).
        self.evict_callback = None

    # ------------------------------------------------------------ queries

    def available_pages(self) -> int:
        return len(self._free)

    def available_tokens(self) -> int:
        return len(self._free) * self.page_size

    @property
    def total_pages(self) -> int:
        return self.num_pages - 1

    # ------------------------------------------------------------ alloc/free

    def alloc(self, n_pages: int) -> Optional[List[int]]:
        if n_pages > len(self._free) and self.evict_callback is not None:
            self.evict_callback(n_pages - len(self._free))
        if n_pages > len(self._free):
            return None
        if n_pages == 0:
            return []
        pages = self._free[-n_pages:]
        del self._free[-n_pages:]
        for p in pages:
            self._ref[p] = 1
        return pages

    def inc_ref(self, pages: Sequence[int]) -> None:
        for p in pages:
            assert self._ref[p] > 0, f"inc_ref on free page {p}"
            self._ref[p] += 1

    def free(self, pages: Sequence[int]) -> None:
        for p in pages:
            if p == 0:
                continue
            r = self._ref[p]
            assert r > 0, f"double free of page {p}"
            self._ref[p] = r - 1
            if r == 1:
                self._free.append(p)

    def ref_count(self, page: int) -> int:
        return int(self._ref[page])

    def check_leaks(self) -> int:
        """Pages still held (excluding garbage page). 0 when fully idle
        (reference `scheduler.py:3349 is_fully_idle` leak check)."""
        return self.total_pages - len(self._free)
