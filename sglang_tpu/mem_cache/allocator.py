"""Host-side KV page allocator with reference counting.

Parity with reference `srt/mem_cache/allocator.py` (`TokenToKVPoolAllocator:121`,
`PagedTokenToKVPoolAllocator:362`). TPU design: allocation is page-granular
only (pages are the DMA unit of the Pallas attention kernel), and pages are
reference-counted so the radix prefix cache can share pages between requests
(the reference splits this between allocator free-lists and radix lock-refs;
fusing refcounts into the allocator keeps eviction and retraction simple).

Page 0 is reserved as the garbage page: padded tokens in a bucketed batch
write their KV there.

DP-attention (reference --enable-dp-attention, `layers/dp_attention.py:53`):
with `dp_size > 1` the page space is range-partitioned into dp regions —
region r owns pages [r*ppr, (r+1)*ppr) where ppr = num_pages // dp — and
the pool array is sharded over the "data" mesh axis on the page dim, so a
region's pages live on one DP group's chips. Every region reserves its
FIRST page (r*ppr) as a rank-local garbage page (the shard-local analogue
of page 0): rows owned by other ranks redirect their KV writes there
inside the sharded attention kernel. A request's pages all come from one
region (`rank=` at alloc), so its attention runs entirely on that group.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


class PageAllocator:
    def __init__(self, num_pages: int, page_size: int, dp_size: int = 1):
        assert num_pages > 1
        self.num_pages = num_pages
        self.page_size = page_size
        self.dp_size = dp_size
        self.pages_per_rank = num_pages // dp_size
        assert self.pages_per_rank > 1
        self._ref = np.zeros(num_pages, dtype=np.int32)
        # LIFO free list per DP region; page r*ppr reserved as that
        # region's garbage page (region 0's is the global page 0).
        self._free: List[List[int]] = []
        for r in range(dp_size):
            lo = r * self.pages_per_rank
            hi = (r + 1) * self.pages_per_rank if r < dp_size - 1 else num_pages
            self._free.append(list(range(hi - 1, lo, -1)))
            self._ref[lo] = 1  # garbage page permanently held
        # Optional eviction hook: called with (shortfall, rank) before an
        # alloc fails, so the radix cache can LRU-evict into the free list
        # (reference interleaves this in `PrefillAdder` / `evict` calls).
        self.evict_callback = None

    # ------------------------------------------------------------ queries

    def available_pages(self, rank: int = None) -> int:
        if rank is None:
            return sum(len(f) for f in self._free)
        return len(self._free[rank])

    def available_tokens(self, rank: int = None) -> int:
        return self.available_pages(rank) * self.page_size

    @property
    def total_pages(self) -> int:
        return self.num_pages - self.dp_size

    def page_rank(self, page: int) -> int:
        """DP region owning a page id."""
        return min(page // self.pages_per_rank, self.dp_size - 1)

    def least_loaded_rank(self) -> int:
        """Region with the most free pages (admission-time assignment)."""
        return max(range(self.dp_size), key=lambda r: len(self._free[r]))

    # ------------------------------------------------------------ alloc/free

    STRIPED = -2  # rank sentinel: spread the allocation across regions

    def alloc(self, n_pages: int, rank: int = 0) -> Optional[List[int]]:
        if rank == self.STRIPED:
            return self.alloc_striped(n_pages)
        free = self._free[rank]
        if n_pages > len(free) and self.evict_callback is not None:
            self.evict_callback(n_pages - len(free), rank)
        if n_pages > len(free):
            return None
        if n_pages == 0:
            return []
        pages = free[-n_pages:]
        del free[-n_pages:]
        for p in pages:
            self._ref[p] = 1
        return pages

    def alloc_striped(self, n_pages: int) -> Optional[List[int]]:
        """Round-robin pages across ALL regions (pool-sharded CP: one
        sequence's KV spans every rank's pool shard, so a context larger
        than one chip's pool still fits the mesh). Page i of the run
        comes from region i % dp_size."""
        if n_pages == 0:
            return []
        need = [0] * self.dp_size
        for i in range(n_pages):
            need[i % self.dp_size] += 1
        for r in range(self.dp_size):
            short = need[r] - len(self._free[r])
            if short > 0 and self.evict_callback is not None:
                self.evict_callback(short, r)
            if need[r] > len(self._free[r]):
                return None
        pages: List[int] = []
        for i in range(n_pages):
            r = i % self.dp_size
            p = self._free[r].pop()
            self._ref[p] = 1
            pages.append(p)
        return pages

    def inc_ref(self, pages: Sequence[int]) -> None:
        for p in pages:
            assert self._ref[p] > 0, f"inc_ref on free page {p}"
            self._ref[p] += 1

    def free(self, pages: Sequence[int]) -> None:
        for p in pages:
            if p % self.pages_per_rank == 0:
                continue  # a region's garbage page is never freed
            r = self._ref[p]
            assert r > 0, f"double free of page {p}"
            self._ref[p] = r - 1
            if r == 1:
                self._free[self.page_rank(p)].append(p)

    def ref_count(self, page: int) -> int:
        return int(self._ref[page])

    def check_leaks(self) -> int:
        """Pages still held (excluding garbage pages). 0 when fully idle
        (reference `scheduler.py:3349 is_fully_idle` leak check)."""
        return self.total_pages - sum(len(f) for f in self._free)
