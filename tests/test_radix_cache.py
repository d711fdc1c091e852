"""RadixCache + PageAllocator unit tests (reference
`test/registered/radix_cache` category; tree semantics from
`srt/mem_cache/radix_cache.py`)."""

import pytest

from sglang_tpu.mem_cache.allocator import PageAllocator
from sglang_tpu.mem_cache.radix_cache import RadixCache

PS = 4


def make():
    alloc = PageAllocator(num_pages=64, page_size=PS)
    return alloc, RadixCache(alloc, PS)


def test_alloc_free_refcount():
    alloc, _ = make()
    pages = alloc.alloc(3)
    assert len(pages) == 3 and 0 not in pages
    alloc.inc_ref(pages)
    alloc.free(pages)
    assert alloc.check_leaks() == 3  # still one ref each
    alloc.free(pages)
    assert alloc.check_leaks() == 0


def test_match_insert_roundtrip():
    alloc, tree = make()
    ids = list(range(12))  # 3 pages
    pages = alloc.alloc(3)
    tree.insert(ids, pages)
    m = tree.match_prefix(ids)
    assert m.length == 12 and m.pages == pages
    # partial match: first 2 pages
    m2 = tree.match_prefix(ids[:8] + [99, 98, 97, 96])
    assert m2.length == 8 and m2.pages == pages[:2]
    # no match
    m3 = tree.match_prefix([50, 51, 52, 53])
    assert m3.length == 0


def test_split_on_divergence():
    alloc, tree = make()
    a = alloc.alloc(3)
    b = alloc.alloc(3)
    ids_a = [1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12]
    ids_b = [1, 2, 3, 4, 5, 6, 7, 8, 20, 21, 22, 23]
    tree.insert(ids_a, a)
    tree.insert(ids_b, b)
    ma = tree.match_prefix(ids_a)
    mb = tree.match_prefix(ids_b)
    assert ma.length == 12 and ma.pages == a
    assert mb.length == 12
    assert mb.pages[:2] == a[:2]  # shared prefix uses first insert's pages
    assert mb.pages[2] == b[2]


def test_evict_lru():
    alloc, tree = make()
    a = alloc.alloc(2)
    tree.insert([1, 2, 3, 4, 5, 6, 7, 8], a)
    alloc.free(a)  # only the tree holds them now
    assert tree.evictable_pages == 2
    freed = tree.evict(2)
    assert freed == 2
    assert alloc.check_leaks() == 0
    assert tree.match_prefix([1, 2, 3, 4]).length == 0


def test_locked_nodes_not_evicted():
    alloc, tree = make()
    a = alloc.alloc(2)
    tree.insert([1, 2, 3, 4, 5, 6, 7, 8], a)
    alloc.free(a)
    m = tree.match_prefix([1, 2, 3, 4, 5, 6, 7, 8])
    tree.lock_and_ref(m)  # a running request now depends on the path
    assert tree.evict(100) == 0
    tree.unlock(m.node)
    alloc.free(m.pages)  # drop the request's refs taken by lock_and_ref
    assert tree.evict(100) == 2


def test_evict_callback_from_allocator():
    alloc, tree = make()
    alloc.evict_callback = tree.evict
    pages = alloc.alloc(60)  # 63 free total, 60 taken
    a = alloc.alloc(3)
    tree.insert(list(range(12)), a)
    alloc.free(a)  # tree-only refs; free list empty-ish
    assert alloc.available_pages() == 0
    got = alloc.alloc(2)  # must trigger eviction of the tree pages
    assert got is not None and len(got) == 2
