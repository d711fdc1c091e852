"""C++ radix tree / ngram parity vs the Python implementations
(reference `mem_cache/cpp_radix_tree`, `speculative/cpp_ngram` coverage)."""

import numpy as np
import pytest

from sglang_tpu.csrc import get_native_lib
from sglang_tpu.mem_cache.allocator import PageAllocator
from sglang_tpu.mem_cache.radix_cache import RadixCache

native_available = get_native_lib() is not None
pytestmark = pytest.mark.skipif(
    not native_available, reason="g++ unavailable / native build failed"
)

PS = 4


def make_native():
    from sglang_tpu.mem_cache.native_radix import NativeRadixCache

    alloc = PageAllocator(num_pages=64, page_size=PS)
    return alloc, NativeRadixCache(alloc, PS)


def test_native_match_insert_evict_parity():
    rng = np.random.default_rng(0)
    alloc_p, tree_p = PageAllocator(64, PS), None
    tree_p = RadixCache(alloc_p, PS)
    alloc_n, tree_n = make_native()
    sequences = []
    for trial in range(30):
        n = int(rng.integers(1, 6)) * PS
        if sequences and rng.random() < 0.5:
            base = sequences[int(rng.integers(0, len(sequences)))]
            ids = base[: int(rng.integers(0, len(base) // PS + 1)) * PS]
            ids = ids + rng.integers(0, 50, size=n).tolist()
        else:
            ids = rng.integers(0, 50, size=n).tolist()
        sequences.append(ids)
        mp = tree_p.match_prefix(ids)
        mn = tree_n.match_prefix(ids)
        assert mn.length == mp.length, (trial, ids)
        assert mn.pages == mp.pages
        # allocate fresh pages for the unmatched tail and insert into both
        tail_pages = len(ids) // PS - mp.length // PS
        pp = alloc_p.alloc(tail_pages) or []
        pn = alloc_n.alloc(tail_pages) or []
        if len(pp) != tail_pages or len(pn) != tail_pages:
            continue
        tree_p.insert(ids, mp.pages + pp)
        tree_n.insert(ids, mn.pages + pn)
        alloc_p.free(pp)
        alloc_n.free(pn)
        assert tree_n.total_pages == tree_p.total_pages, trial
        assert tree_n.evictable_pages == tree_p.evictable_pages, trial
    # evict everything; both must free the same number of pages
    fp = tree_p.evict(1 << 30)
    fn = tree_n.evict(1 << 30)
    assert fn == fp
    assert alloc_n.check_leaks() == alloc_p.check_leaks() == 0


def test_native_lock_blocks_eviction():
    alloc, tree = make_native()
    pages = alloc.alloc(2)
    ids = [1, 2, 3, 4, 5, 6, 7, 8]
    tree.insert(ids, pages)
    alloc.free(pages)
    m = tree.match_prefix(ids)
    assert m.length == 8
    tree.lock_and_ref(m)
    assert tree.evict(100) == 0
    tree.unlock(m.node)
    alloc.free(m.pages)
    assert tree.evict(100) == 2
    assert alloc.check_leaks() == 0


def test_native_ngram_parity():
    import os

    os.environ["SGLANG_TPU_DISABLE_NATIVE"] = "0"
    from sglang_tpu.speculative.ngram_worker import NgramProposer

    rng = np.random.default_rng(1)
    p_native = NgramProposer(1, 4, 4)
    p_python = NgramProposer(1, 4, 4)
    p_python._native_lib = None  # force python path
    assert p_native._native() is not None
    for _ in range(200):
        n = int(rng.integers(1, 40))
        toks = rng.integers(0, 6, size=n).tolist()  # small alphabet: repeats
        assert p_native.propose(toks) == p_python.propose(toks), toks
