"""RadixAttention prefix cache.

Parity with reference `srt/mem_cache/radix_cache.py:272 RadixCache`
(`TreeNode:206`, `match_prefix:363`, `insert:423`, `cache_finished_req:443`,
LRU `evict:563`, lock refs `:592`) — page-aligned like the reference's
page_size>1 mode (`RadixKey` page hashing `:190`).

This is host-side pure Python (it ports almost unchanged per SURVEY §7.4);
the device never sees the tree, only the page tables it yields.

Page-reference protocol (fused with the ref-counting PageAllocator):
- every request holds one allocator ref for every page it uses (freshly
  allocated pages come with ref=1; radix-matched pages get inc_ref at match
  time);
- the tree holds its own allocator ref for every page stored in a node;
- node lock_refs (request admission -> +1 on the matched path) only gate
  eviction, never page lifetime.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Dict, List, Optional

from sglang_tpu.mem_cache.allocator import PageAllocator


class TreeNode:
    __slots__ = (
        "children",
        "parent",
        "key",
        "pages",
        "lock_ref",
        "last_access_time",
    )

    def __init__(self, parent=None):
        self.children: Dict[tuple, TreeNode] = {}
        self.parent: Optional[TreeNode] = parent
        self.key: List[int] = []  # token ids (len = multiple of page_size)
        self.pages: List[int] = []
        self.lock_ref = 0
        self.last_access_time = time.monotonic()

    @property
    def evictable(self) -> bool:
        return self.lock_ref == 0 and not self.children


@dataclass
class MatchResult:
    pages: List[int]
    length: int  # matched token count (multiple of page_size)
    node: "TreeNode"  # deepest matched node (for lock/unlock)


class RadixCache:
    def __init__(self, allocator: PageAllocator, page_size: int, disable: bool = False):
        self.allocator = allocator
        self.page_size = page_size
        self.disable = disable
        self.events = None  # optional KVEventPublisher (kv_events.py)
        self.reset()

    def reset(self):
        self.root = TreeNode()
        self.root.lock_ref = 1  # never evicted
        self._evictable_pages = 0
        self._total_pages = 0

    # ---------------------------------------------------------------- match

    def _child_key(self, ids: List[int], start: int) -> tuple:
        return tuple(ids[start : start + self.page_size])

    def match_prefix(self, ids: List[int]) -> MatchResult:
        """Longest page-aligned prefix already cached. Does NOT take refs —
        callers use `lock_and_ref` on admission."""
        if self.disable:
            return MatchResult([], 0, self.root)
        ps = self.page_size
        node = self.root
        pages: List[int] = []
        pos = 0
        aligned = (len(ids) // ps) * ps
        while pos < aligned:
            child = node.children.get(self._child_key(ids, pos))
            if child is None:
                break
            # compare full key (first page matched via dict; rest may differ)
            n = len(child.key)
            common = 0
            limit = min(n, aligned - pos)
            while common < limit and ids[pos + common] == child.key[common]:
                common += 1
            common = (common // ps) * ps
            if common == 0:
                break
            if common < n:
                child = self._split_node(child, common)
            child.last_access_time = time.monotonic()
            pages.extend(child.pages)
            pos += common
            node = child
            if common < n:
                break
        return MatchResult(pages, pos, node)

    def _split_node(self, node: TreeNode, length: int) -> TreeNode:
        """Split `node` so its first `length` tokens become the parent part."""
        ps = self.page_size
        upper = TreeNode(parent=node.parent)
        upper.key = node.key[:length]
        upper.pages = node.pages[: length // ps]
        upper.lock_ref = node.lock_ref
        upper.last_access_time = node.last_access_time
        parent = node.parent
        parent.children[tuple(upper.key[:ps])] = upper
        node.key = node.key[length:]
        node.pages = node.pages[length // ps :]
        node.parent = upper
        upper.children[tuple(node.key[:ps])] = node
        return upper

    # ---------------------------------------------------------------- locks

    def lock_and_ref(self, match: MatchResult) -> None:
        """Admission: take allocator refs on matched pages + lock the path."""
        if self.disable or match.length == 0:
            return
        self.allocator.inc_ref(match.pages)
        node = match.node
        while node is not None:
            node.lock_ref += 1
            if node is not self.root and node.lock_ref == 1:
                self._evictable_pages -= len(node.pages)
            node = node.parent

    def lock_path(self, node: TreeNode) -> None:
        """Lock a path WITHOUT taking allocator refs: used to pin a running
        request's own radix-inserted prefix (`_cache_unfinished`). The
        request already holds allocator refs on those pages, so evicting
        the nodes would free nothing into the pool — locking them keeps
        `evictable_pages` an honest \"tokens reclaimable by eviction\"
        count for admission (reference `cache_unfinished_req` moves the
        request's lock onto the inserted node the same way)."""
        if self.disable or node is None:
            return
        while node is not None:
            node.lock_ref += 1
            if node is not self.root and node.lock_ref == 1:
                self._evictable_pages -= len(node.pages)
            node = node.parent

    def unlock(self, node: TreeNode) -> None:
        if self.disable or node is None:
            return
        while node is not None:
            node.lock_ref -= 1
            if node is not self.root and node.lock_ref == 0:
                self._evictable_pages += len(node.pages)
            node = node.parent

    # ---------------------------------------------------------------- insert

    def insert(self, ids: List[int], pages: List[int]) -> int:
        """Insert `ids` (page-aligned length) backed by `pages`.

        For spans already in the tree, the tree's existing pages win (the
        caller's duplicates simply lose their caller ref later). New nodes
        take a fresh allocator ref on their pages. Returns the number of
        pages newly referenced by the tree."""
        if self.disable:
            return 0
        ps = self.page_size
        aligned = (len(ids) // ps) * ps
        node = self.root
        pos = 0
        new_refs = 0
        # the pages the tree ACTUALLY holds along the walked path — may
        # differ from the caller's `pages` where existing spans win; KV
        # events must announce these, never the caller duplicates (which
        # get freed later with no block_removed)
        tree_pages: List[int] = []
        while pos < aligned:
            child = node.children.get(self._child_key(ids, pos))
            if child is None:
                leaf = TreeNode(parent=node)
                leaf.key = list(ids[pos:aligned])
                leaf.pages = list(pages[pos // ps : aligned // ps])
                node.children[tuple(leaf.key[:ps])] = leaf
                self.allocator.inc_ref(leaf.pages)
                self._evictable_pages += len(leaf.pages)
                self._total_pages += len(leaf.pages)
                new_refs += len(leaf.pages)
                tree_pages.extend(leaf.pages)
                pos = aligned
                break
            n = len(child.key)
            common = 0
            limit = min(n, aligned - pos)
            while common < limit and ids[pos + common] == child.key[common]:
                common += 1
            common = (common // ps) * ps
            if common == 0:
                # first page tokens matched dict key but diverged within the
                # page (can't happen: key == first page); defensive
                break
            if common < n:
                child = self._split_node(child, common)
            child.last_access_time = time.monotonic()
            tree_pages.extend(child.pages)
            pos += common
            node = child
        if self.events is not None and pos > 0:
            self.events.block_stored(ids[:pos], tree_pages, ps)
        return new_refs

    # ---------------------------------------------------------------- evict

    @property
    def evictable_pages(self) -> int:
        return max(0, self._evictable_pages)

    @property
    def total_pages(self) -> int:
        return self._total_pages

    def evict(self, num_pages: int, rank: int = None) -> int:
        """LRU-evict leaves until `num_pages` pages are freed (reference
        `radix_cache.py:563`). Returns pages actually freed. With DP
        attention, `rank` restricts eviction to nodes whose pages live in
        that DP region (freeing another region's pages cannot satisfy a
        region-local alloc)."""
        if self.disable or num_pages <= 0:
            return 0
        import heapq

        leaves = [
            (n.last_access_time, id(n), n)
            for n in self._iter_nodes()
            if n.evictable
            and (
                rank is None
                or not n.pages
                or self.allocator.page_rank(n.pages[0]) == rank
            )
        ]
        heapq.heapify(leaves)
        freed = 0
        freed_pages: List[int] = []
        while leaves and freed < num_pages:
            _, _, node = heapq.heappop(leaves)
            if not node.evictable:
                continue
            freed += len(node.pages)
            freed_pages.extend(node.pages)
            self.allocator.free(node.pages)
            self._evictable_pages -= len(node.pages)
            self._total_pages -= len(node.pages)
            parent = node.parent
            del parent.children[tuple(node.key[: self.page_size])]
            if (
                parent is not self.root
                and parent.evictable
                and (
                    rank is None
                    or not parent.pages
                    or self.allocator.page_rank(parent.pages[0]) == rank
                )
            ):
                heapq.heappush(leaves, (parent.last_access_time, id(parent), parent))
        if self.events is not None and freed_pages:
            self.events.block_removed(freed_pages)
        return freed

    def _iter_nodes(self):
        stack = [self.root]
        while stack:
            n = stack.pop()
            for c in n.children.values():
                yield c
                stack.append(c)

    # ---------------------------------------------------------------- stats

    def pretty_print(self) -> str:
        lines = []

        def rec(node, depth):
            for c in node.children.values():
                lines.append(
                    "  " * depth
                    + f"[{len(c.key)} tok, {len(c.pages)} pages, lock={c.lock_ref}]"
                )
                rec(c, depth + 1)

        rec(self.root, 0)
        return "\n".join(lines)
