"""HiCache: hierarchical KV cache with a host-memory tier.

Parity with reference `srt/mem_cache/hiradix_cache.py` (HiRadixCache) +
`srt/managers/cache_controller.py` (HiCacheController): KV pages evicted
from the device radix cache survive in host RAM and are reloaded on a
later prefix hit instead of being recomputed.

TPU-native shape of the design: host<->HBM traffic is the expensive
resource (every transfer is a full host round-trip on a TPU host, and on
a tunneled device it is ~tens of ms), so pages move in ONE batched
gather/scatter per event covering all layers at once
(`ModelRunner.gather_kv_pages` / `scatter_kv_pages`), never per-layer or
per-page. The host index is not a second radix tree but a page-hash
chain (key of page i = intern(key of page i-1, tokens of page i)) — the
same prefix semantics with O(1) lookups and no tree surgery, and it
composes with BOTH radix implementations (Python and native C++) purely
through their public match/insert API:

- write path (write_through): when a finished request publishes its
  aligned prefix to the device tree, pages the host tier lacks are
  copied down in one transfer.
- read path: before admission, each waiting request is matched against
  the device tree, then the host chain beyond that point; host hits are
  copied up into freshly allocated device pages which are inserted into
  the device radix tree, so the normal PrefillAdder admission path sees
  them as ordinary device cache hits (zero changes to admission
  geometry or accounting).

The store is LRU at page granularity. A page whose chain predecessor
was evicted becomes unreachable and ages out the same way.
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class HostKVCache:
    """Host-RAM page store indexed by token-prefix page chains, with an
    optional file-backed third tier (reference HiCache storage backends,
    `hicache_storage.py` file backend): RAM-LRU evictions spill to disk
    and promote back on hit."""

    def __init__(
        self,
        page_size: int,
        bytes_per_page: int,
        capacity_bytes: int,
        disk_dir: str = None,
        disk_capacity_bytes: int = 0,
        storage=None,  # KVStorageBackend; built from disk_dir if None
    ):
        self.page_size = page_size
        self.bytes_per_page = max(1, bytes_per_page)
        self.capacity_pages = max(1, capacity_bytes // self.bytes_per_page)
        # (parent_chain_id, page_tokens) -> chain id; chain id 0 is the root
        self._intern: Dict[Tuple[int, Tuple[int, ...]], int] = {}
        self._store: "OrderedDict[int, np.ndarray]" = OrderedDict()
        if storage is None and disk_dir:
            from sglang_tpu.mem_cache.hicache_storage import (
                create_storage_backend,
            )

            storage = create_storage_backend(disk_dir)
        self.storage = storage
        self.disk_dir = disk_dir
        # L3 LRU index: chain id -> (dtype, shape) of the stored page
        self._disk: "OrderedDict[int, tuple]" = OrderedDict()
        self.disk_capacity_pages = (
            max(1, disk_capacity_bytes // self.bytes_per_page)
            if storage is not None and disk_capacity_bytes
            else (1 << 30 if storage is not None else 0)
        )
        # coarse guard: the async controller's worker thread calls
        # load() (incl. disk promotes) while the scheduler thread calls
        # match()/insert()
        self.lock = threading.RLock()
        self.pages_written = 0
        self.pages_loaded = 0
        self.pages_evicted = 0
        self.pages_spilled = 0
        self.pages_promoted = 0

    # ------------------------------------------------------------- chains

    def _chain_ids(self, ids: List[int], n_pages: int, create: bool) -> List[int]:
        """Chain ids for the first `n_pages` pages of `ids`; without
        `create`, stops at the first page never interned."""
        ps = self.page_size
        out: List[int] = []
        cur = 0
        for p in range(n_pages):
            key = (cur, tuple(ids[p * ps : (p + 1) * ps]))
            nxt = self._intern.get(key)
            if nxt is None:
                if not create:
                    break
                nxt = len(self._intern) + 1
                self._intern[key] = nxt
            out.append(nxt)
            cur = nxt
        return out

    # -------------------------------------------------------------- reads

    def _match_impl(self, ids: List[int]) -> int:
        """Number of contiguous leading pages of `ids` present in the host
        store or its disk tier (page-aligned; partial trailing page
        ignored)."""
        n_pages = len(ids) // self.page_size
        chain = self._chain_ids(ids, n_pages, create=False)
        hit = 0
        for cid in chain:
            if cid not in self._store and cid not in self._disk:
                break
            hit += 1
        return hit

    def _load_impl(self, ids: List[int], start_page: int, n: int) -> Optional[np.ndarray]:
        """Stacked [n, ...page] host data for pages [start_page,
        start_page+n) of `ids`, or None if any is missing."""
        chain = self._chain_ids(ids, start_page + n, create=False)
        if len(chain) < start_page + n:
            return None
        out = []
        for cid in chain[start_page:]:
            page = self._store.get(cid)
            if page is None:
                page = self._promote(cid)
            if page is None:
                return None
            if cid in self._store:
                self._store.move_to_end(cid)  # LRU refresh
            out.append(page)
        self.pages_loaded += n
        return np.stack(out, axis=0)

    # ------------------------------------------------------------- writes

    def _insert_impl(self, ids: List[int], start_page: int, data: np.ndarray) -> int:
        """Store pages [start_page, start_page + len(data)) of `ids`.
        Returns the number of pages newly stored."""
        n = len(data)
        chain = self._chain_ids(ids, start_page + n, create=True)
        stored = 0
        for i, cid in enumerate(chain[start_page:]):
            if cid in self._store:
                self._store.move_to_end(cid)
                continue
            self._store[cid] = np.ascontiguousarray(data[i])
            stored += 1
        self.pages_written += stored
        while len(self._store) > self.capacity_pages:
            cid_e, page_e = self._store.popitem(last=False)
            self.pages_evicted += 1
            self._spill(cid_e, page_e)
        return stored

    # ---------------------------------------------------------- disk tier

    def _spill(self, cid: int, page: np.ndarray) -> None:
        if self.storage is None or cid in self._disk:
            return
        # raw bytes + in-memory (dtype, shape): np.save mangles ml_dtypes
        # like bfloat16 into void records
        page = np.ascontiguousarray(page)
        self.storage.put(cid, page.view(np.uint8).tobytes())
        self._disk[cid] = (page.dtype, page.shape)
        self.pages_spilled += 1
        while len(self._disk) > self.disk_capacity_pages:
            old_cid, _ = self._disk.popitem(last=False)
            self.storage.delete(old_cid)

    def _promote(self, cid: int):
        entry = self._disk.get(cid)
        if entry is None:
            return None
        dtype, shape = entry
        raw = self.storage.get(cid)
        if raw is None:
            self._disk.pop(cid, None)
            return None
        page = np.frombuffer(raw, dtype=np.uint8).view(dtype).reshape(shape)
        self.pages_promoted += 1
        self._store[cid] = page  # back into RAM (insert handles overflow)
        while len(self._store) > self.capacity_pages:
            cid_e, page_e = self._store.popitem(last=False)
            self.pages_evicted += 1
            self._spill(cid_e, page_e)
        return page

    def match(self, ids: List[int]) -> int:
        with self.lock:
            return self._match_impl(ids)

    def load(self, ids: List[int], start_page: int, n: int) -> Optional[np.ndarray]:
        with self.lock:
            return self._load_impl(ids, start_page, n)

    def insert(self, ids: List[int], start_page: int, data: np.ndarray) -> int:
        with self.lock:
            return self._insert_impl(ids, start_page, data)

    @property
    def num_pages(self) -> int:
        return len(self._store)


class HiCacheController:
    """Scheduler-side glue between the device radix tree and HostKVCache
    (reference HiCacheController roles: write-through on publish, prefetch
    -and-insert before admission)."""

    def __init__(
        self,
        runner,
        radix_cache,
        allocator,
        capacity_bytes: int,
        disk_dir: str = None,
        disk_capacity_bytes: int = 0,
        async_io: bool = True,
    ):
        self.runner = runner
        self.radix_cache = radix_cache
        self.allocator = allocator
        self.page_size = runner.page_size
        bytes_per_page = runner.kv_pool.bytes_per_page()
        self.host = HostKVCache(
            self.page_size,
            bytes_per_page,
            capacity_bytes,
            disk_dir=disk_dir,
            disk_capacity_bytes=disk_capacity_bytes,
        )
        # async IO (reference `cache_controller.py` worker threads +
        # LayerDoneCounter role): spill readbacks and host/disk loads run
        # on a worker thread; the scheduler only dispatches device ops and
        # drains a completion queue at step boundaries, so decode keeps
        # stepping while transfers are in flight.
        self.async_io = async_io
        self.inflight_spills = 0
        self._pending_loads: Dict[tuple, float] = {}
        if async_io:
            self._jobs: "queue.Queue" = queue.Queue()
            self._done: "queue.Queue" = queue.Queue()
            self._worker = threading.Thread(
                target=self._worker_loop, name="hicache-io", daemon=True
            )
            self._worker.start()
        logger.info(
            "hicache: host tier %.2f GiB = %d pages (async_io=%s)",
            capacity_bytes / (1 << 30),
            self.host.capacity_pages,
            async_io,
        )

    # ------------------------------------------------------------- worker

    def _worker_loop(self):
        while True:
            job = self._jobs.get()
            if job is None:
                return
            try:
                if job[0] == "spill":
                    _, ids, hit, handle = job
                    data = self.runner.fetch_gathered_kv(handle)
                    self._done.put(("spill", ids, hit, data))
                else:
                    _, key, ids, dev_pages, host_pages = job
                    data = self.host.load(ids, dev_pages, host_pages)
                    self._done.put(
                        ("load", key, ids, dev_pages, host_pages, data)
                    )
            except Exception:
                logger.exception("hicache worker job failed")
                if job[0] == "load":
                    self._done.put(("load", job[1], job[2], 0, 0, None))
                else:
                    self._done.put(("spill", None, 0, None))

    def close(self):
        if self.async_io:
            self._jobs.put(None)
            self._worker.join(timeout=5)

    def poll(self) -> int:
        """Drain worker completions on the scheduler thread (called at
        step boundaries). Returns tokens newly published to the device
        tree by finished loads."""
        if not self.async_io:
            return 0
        tokens = 0
        while True:
            try:
                item = self._done.get_nowait()
            except queue.Empty:
                return tokens
            tokens += self._process_done(item)

    def _process_done(self, item) -> int:
        if item[0] == "spill":
            _, ids, hit, data = item
            self.inflight_spills -= 1
            if ids is not None and data is not None:
                self.host.insert(ids, hit, data)
            return 0
        _, key, ids, dev_pages, host_pages, data = item
        self._pending_loads.pop(key, None)
        if data is None:
            return 0
        return self._publish_load(ids, dev_pages, host_pages, data)

    def wait_idle(self, timeout: float = 10.0) -> int:
        """Block until every in-flight spill/load has been processed
        (tests + graceful shutdown). Returns tokens published."""
        if not self.async_io:
            return 0
        import time as _time

        deadline = _time.monotonic() + timeout
        tokens = self.poll()
        while (
            (self.inflight_spills > 0 or self._pending_loads)
            and _time.monotonic() < deadline
        ):
            try:
                item = self._done.get(timeout=0.05)
            except queue.Empty:
                continue
            tokens += self._process_done(item)
        return tokens

    def _publish_load(self, ids, dev_pages, host_pages, data) -> int:
        """Scatter loaded host pages into fresh device pages and insert
        them into the device tree (scheduler thread: owns the allocator
        and all jax dispatch). The tree may have changed since the load
        was submitted — re-match and keep only the contiguous extension."""
        ps = self.page_size
        m = self.radix_cache.match_prefix(ids[: (dev_pages + host_pages) * ps])
        dev_now = m.length // ps
        if dev_now < dev_pages or dev_now >= dev_pages + host_pages:
            return 0  # tree shrank below the load base, or grew past it
        off = dev_now - dev_pages
        use = data[off:]
        n = len(use)
        if self.allocator.available_tokens() < n * ps:
            return 0
        new_pages = self.allocator.alloc(
            n,
            rank=(
                self.allocator.page_rank(m.pages[0])
                if dev_now
                else self.allocator.least_loaded_rank()
            ),
        )
        if new_pages is None:
            return 0
        self.runner.scatter_kv_pages(new_pages, use)
        total = (dev_now + n) * ps
        self.radix_cache.insert(
            ids[:total], list(m.pages[:dev_now]) + new_pages
        )
        self.allocator.free(new_pages)
        return n * ps

    def pending_load_for(self, ids: List[int]) -> bool:
        """True while a host->device load for this prefix is in flight
        (admission can briefly hold the request to realize the hit)."""
        if not self._pending_loads:
            return False
        ps = self.page_size
        aligned = ((len(ids) - 1) // ps) * ps
        return self._load_key(ids, aligned) in self._pending_loads

    @staticmethod
    def _load_key(ids: List[int], aligned: int) -> tuple:
        return (aligned, hash(tuple(ids[:aligned])))

    def write_through(self, ids: List[int], pages: List[int]) -> None:
        """Copy the device pages backing the aligned prefix `ids` down to
        the host tier (pages the host already has are skipped). Async
        mode dispatches the gather and hands the blocking readback to the
        worker — the scheduler thread never waits on the transfer."""
        n_pages = len(ids) // self.page_size
        if n_pages == 0:
            return
        hit = self.host.match(ids)
        if hit >= n_pages:
            return
        if self.async_io:
            handle = self.runner.gather_kv_pages_async(pages[hit:n_pages])
            self.inflight_spills += 1
            self._jobs.put(("spill", list(ids), hit, handle))
            return
        data = self.runner.gather_kv_pages(pages[hit:n_pages])
        self.host.insert(ids, hit, data)

    def prefetch(self, ids: List[int], decode_headroom_tokens: int) -> int:
        """Load host-tier pages beyond the device-tree match into fresh
        device pages and publish them to the device radix tree. Returns
        tokens loaded (sync mode) — async mode submits the host/disk read
        to the worker and returns 0; the pages publish via `poll()` and
        admission can hold the request briefly (`pending_load_for`).
        Never evicts device cache to make room (host reload must not
        thrash the hotter device tier)."""
        ps = self.page_size
        # the last token must stay uncached so prefill produces logits
        aligned = ((len(ids) - 1) // ps) * ps
        if aligned <= 0:
            return 0
        m = self.radix_cache.match_prefix(ids[:aligned])
        dev_pages = m.length // ps
        host_pages = self.host.match(ids[:aligned]) - dev_pages
        if host_pages <= 0:
            return 0
        need_tokens = host_pages * ps
        if self.allocator.available_tokens() < need_tokens + decode_headroom_tokens:
            return 0
        if self.async_io:
            key = self._load_key(ids, aligned)
            if key not in self._pending_loads:
                self._pending_loads[key] = True
                self._jobs.put(
                    ("load", key, list(ids), dev_pages, host_pages)
                )
            return 0
        data = self.host.load(ids, dev_pages, host_pages)
        if data is None:
            return 0
        rank = (
            self.allocator.page_rank(m.pages[0])
            if dev_pages
            else self.allocator.least_loaded_rank()
        )
        new_pages = self.allocator.alloc(host_pages, rank=rank)
        if new_pages is None:
            return 0
        self.runner.scatter_kv_pages(new_pages, data)
        total = m.length + need_tokens
        self.radix_cache.insert(
            ids[:total], list(m.pages[:dev_pages]) + new_pages
        )
        # the tree took its own ref; release ours
        self.allocator.free(new_pages)
        return need_tokens
