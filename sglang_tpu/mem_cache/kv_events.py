"""KV cache event publishing.

Parity with reference `srt/mem_cache/storage/kv_events` + the
`--enable-kv-cache-events` flag: the engine announces prefix-cache
content changes (blocks stored / removed / cleared) so external routers
can steer shared-prefix traffic to the replica that already holds the KV
(fleet-level version of the in-process radix match).

Event schema (JSON):
    {"event": "block_stored", "ts": ..., "blocks": [
        {"hash": <chain-hash of the page>, "parent": <hash or None>,
         "pages": [page_id], "num_tokens": N}, ...]}
    {"event": "block_removed", "ts": ..., "pages": [page_id, ...]}
    {"event": "all_cleared", "ts": ...}

Block identity is the page-chain hash (hash of (parent_hash, page
tokens)) — the same prefix-identity scheme as the HiCache host tier, so
a subscriber can mirror prefix-cache contents without seeing token ids.
Removals are reported by page id (the device allocator evicts pages, not
chains); subscribers resolve them through the hash->pages map they build
from stored events. Transports: in-process subscriber callbacks, plus an
optional ZMQ PUB socket (`--kv-events-addr tcp://host:port`).
"""

from __future__ import annotations

import hashlib
import json
import threading
import time
from typing import Callable, Dict, List, Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def page_chain_hash(parent: Optional[str], tokens: List[int]) -> str:
    h = hashlib.sha1()
    if parent:
        h.update(parent.encode())
    h.update(json.dumps(tokens).encode())
    return h.hexdigest()[:16]


class KVEventPublisher:
    def __init__(self, zmq_addr: Optional[str] = None):
        self._subs: List[Callable[[dict], None]] = []
        self._lock = threading.Lock()
        self._zmq_sock = None
        self.events_published = 0
        if zmq_addr:
            try:
                import zmq

                ctx = zmq.Context.instance()
                self._zmq_sock = ctx.socket(zmq.PUB)
                self._zmq_sock.bind(zmq_addr)
                logger.info("kv events on %s", zmq_addr)
            except Exception as e:  # keep serving without the socket
                logger.warning("kv events zmq bind failed: %s", e)

    def subscribe(self, fn: Callable[[dict], None]) -> None:
        with self._lock:
            self._subs.append(fn)

    def _emit(self, event: dict) -> None:
        event["ts"] = time.time()
        # monotone sequence number: mirrors detect lost events (ZMQ PUB
        # drops under backpressure / reconnect) and reconcile by clearing
        event["seq"] = self.events_published
        self.events_published += 1
        with self._lock:
            subs = list(self._subs)
        for fn in subs:
            try:
                fn(event)
            except Exception:
                logger.exception("kv event subscriber failed")
        if self._zmq_sock is not None:
            try:
                self._zmq_sock.send_string(json.dumps(event), flags=1)  # NOBLOCK
            except Exception:
                pass

    # ---------------------------------------------------------------- API

    def block_stored(
        self, ids: List[int], pages: List[int], page_size: int
    ) -> None:
        """Announce the page-aligned prefix `ids` backed by `pages`."""
        blocks = []
        parent = None
        for p in range(len(ids) // page_size):
            toks = ids[p * page_size : (p + 1) * page_size]
            h = page_chain_hash(parent, toks)
            blocks.append(
                {
                    "hash": h,
                    "parent": parent,
                    "pages": [int(pages[p])],
                    "num_tokens": len(toks),
                }
            )
            parent = h
        if blocks:
            self._emit({"event": "block_stored", "blocks": blocks})

    def block_removed(self, pages: List[int]) -> None:
        if pages:
            self._emit(
                {"event": "block_removed", "pages": [int(p) for p in pages]}
            )

    def all_cleared(self) -> None:
        self._emit({"event": "all_cleared"})


class KVEventMirror:
    """Reference subscriber: reconstructs the set of cached prefixes from
    the event stream (what an external cache-aware router would keep)."""

    def __init__(self, publisher: KVEventPublisher):
        self.blocks: Dict[str, dict] = {}  # hash -> block
        self.page_to_hash: Dict[int, str] = {}
        self._next_seq = None  # expected next sequence number
        self.resyncs = 0  # gap-triggered clears (observability)
        # events arrive on the subscriber (ZMQ pump) thread while a router
        # reads via match_prefix_pages on its own thread
        self._lock = threading.Lock()
        publisher.subscribe(self._on_event)

    def _on_event(self, e: dict) -> None:
        with self._lock:
            seq = e.get("seq")
            if seq is not None:
                if self._next_seq is not None and seq != self._next_seq:
                    # lost events (PUB drop / reconnect): the mirror is
                    # stale in an unknown way — reconcile by clearing; it
                    # reconverges as new stored events arrive (reference
                    # gateway cache-aware tree resync)
                    self.blocks.clear()
                    self.page_to_hash.clear()
                    self.resyncs += 1
                self._next_seq = seq + 1
            if e["event"] == "block_stored":
                for b in e["blocks"]:
                    self.blocks[b["hash"]] = b
                    for p in b["pages"]:
                        self.page_to_hash[p] = b["hash"]
            elif e["event"] == "block_removed":
                for p in e["pages"]:
                    h = self.page_to_hash.pop(p, None)
                    if h:
                        self.blocks.pop(h, None)
            elif e["event"] == "all_cleared":
                self.blocks.clear()
                self.page_to_hash.clear()

    def match_prefix_pages(self, ids: List[int], page_size: int) -> int:
        """How many leading pages of `ids` the mirrored cache holds."""
        parent = None
        hit = 0
        with self._lock:
            blocks = self.blocks
            for p in range(len(ids) // page_size):
                h = page_chain_hash(
                    parent, ids[p * page_size : (p + 1) * page_size]
                )
                if h not in blocks:
                    break
                hit += 1
                parent = h
        return hit
