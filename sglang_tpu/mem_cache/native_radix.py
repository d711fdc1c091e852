"""ctypes facade over the C++ radix tree (drop-in for `RadixCache`).

Parity with reference `mem_cache/cpp_radix_tree/` (tree in C++, pages
managed host-side): match/insert/evict run native; the Python side only
adjusts PageAllocator refcounts from the page lists the tree reports.
"""

from __future__ import annotations

import ctypes
from typing import List

import numpy as np

from sglang_tpu.mem_cache.allocator import PageAllocator
from sglang_tpu.mem_cache.radix_cache import MatchResult


class NativeRadixCache:
    def __init__(self, allocator: PageAllocator, page_size: int, disable: bool = False):
        from sglang_tpu.csrc import get_native_lib

        self.lib = get_native_lib()
        assert self.lib is not None, "native lib unavailable"
        self.allocator = allocator
        self.page_size = page_size
        self.disable = disable
        self.tree = self.lib.rt_new(page_size)
        self._scratch = np.zeros(1 << 16, dtype=np.int32)
        self.events = None  # optional KVEventPublisher (kv_events.py)

    def __del__(self):
        try:
            if getattr(self, "tree", None):
                self.lib.rt_free(self.tree)
                self.tree = None
        except Exception:
            pass

    def _ptr(self, arr: np.ndarray):
        return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    # ------------------------------------------------------------------ API

    def reset(self):
        self.lib.rt_reset(self.tree)

    def match_prefix(self, ids: List[int]) -> MatchResult:
        if self.disable or not ids:
            return MatchResult([], 0, None)
        arr = np.asarray(ids, dtype=np.int32)
        node = ctypes.c_void_p()
        matched = self.lib.rt_match(
            self.tree,
            self._ptr(arr),
            len(arr),
            self._ptr(self._scratch),
            len(self._scratch),
            ctypes.byref(node),
        )
        n_pages = matched // self.page_size
        return MatchResult(
            self._scratch[:n_pages].tolist(), int(matched), node.value
        )

    def lock_and_ref(self, match: MatchResult) -> None:
        if self.disable or match.length == 0:
            return
        self.allocator.inc_ref(match.pages)
        if match.node:
            self.lib.rt_lock(self.tree, match.node, 1)

    def lock_path(self, node) -> None:
        """Lock without allocator refs (see RadixCache.lock_path)."""
        if self.disable or not node:
            return
        self.lib.rt_lock(self.tree, node, 1)

    def unlock(self, node) -> None:
        if self.disable or not node:
            return
        self.lib.rt_lock(self.tree, node, -1)

    def insert(self, ids: List[int], pages: List[int]) -> int:
        if self.disable or not ids:
            return 0
        arr = np.asarray(ids, dtype=np.int32)
        parr = np.asarray(pages, dtype=np.int32)
        n_new = self.lib.rt_insert(
            self.tree,
            self._ptr(arr),
            len(arr),
            self._ptr(parr),
            self._ptr(self._scratch),
            len(self._scratch),
        )
        new_pages = self._scratch[:n_new].tolist()
        if new_pages:
            self.allocator.inc_ref(new_pages)
        if self.events is not None:
            # announce the pages the tree ACTUALLY retained along this
            # prefix (existing spans win over caller duplicates); re-read
            # them from the tree rather than trusting the caller's list
            m = self.match_prefix(list(ids))
            if m.length > 0:
                self.events.block_stored(
                    list(ids)[: m.length], m.pages, self.page_size
                )
        return len(new_pages)

    def evict(self, num_pages: int, rank: int = None) -> int:
        # the C++ tree has no DP-region filter; create_radix_cache selects
        # the Python tree when dp_size > 1, so rank here is always the
        # single region 0
        if self.disable or num_pages <= 0:
            return 0
        freed = self.lib.rt_evict(
            self.tree, num_pages, self._ptr(self._scratch), len(self._scratch)
        )
        pages = self._scratch[:freed].tolist()
        if pages:
            self.allocator.free(pages)
            if self.events is not None:
                self.events.block_removed(pages)
        return len(pages)

    @property
    def evictable_pages(self) -> int:
        return int(self.lib.rt_evictable_pages(self.tree))

    @property
    def total_pages(self) -> int:
        return int(self.lib.rt_total_pages(self.tree))

    def pretty_print(self) -> str:
        return f"<native radix tree: {self.total_pages} pages>"


def create_radix_cache(allocator: PageAllocator, page_size: int, disable: bool):
    """Prefer the C++ tree; fall back to the Python implementation
    (reference selects `RadixCache` vs its C++ tree the same way)."""
    import os

    from sglang_tpu.mem_cache.radix_cache import RadixCache

    if (
        os.environ.get("SGLANG_TPU_DISABLE_NATIVE") != "1"
        and getattr(allocator, "dp_size", 1) == 1
    ):
        try:
            return NativeRadixCache(allocator, page_size, disable)
        except Exception:
            pass
    return RadixCache(allocator, page_size, disable)
