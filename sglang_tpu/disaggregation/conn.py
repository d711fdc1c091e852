"""Cross-host KV transfer for PD disaggregation.

Reference analogue: `srt/disaggregation/base/conn.py:30` (KVSender/
KVReceiver ABC), `mooncake/conn.py` (production transport),
`fake/conn.py:22` (test seam). TPU redesign: the transfer is PULL-model
and CONTENT-keyed — the decode side requests "the cached KV prefix for
these token ids" and the prefill side answers from its radix tree. No
bootstrap-room state machine is needed: token ids are the key, the
operation is idempotent, and a retried/failover fetch is naturally
correct. Pages move as one batched all-layer buffer (the same
gather/scatter primitives as the HiCache tier).

Wire protocol (TCP, DCN-friendly):
    request:  4-byte LE header length | JSON {"cmd","token_ids","have"}
    response: 4-byte LE header length | JSON {"tokens","pages","shape",
              "dtype"} | raw page bytes
"""

from __future__ import annotations

import json
import socket
import socketserver
import struct
import threading
from typing import List, Optional, Tuple

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class KVTransferBackend:
    """Decode-side handle that fetches prefix KV pages by content."""

    def fetch(
        self, token_ids: List[int], have_pages: int
    ) -> Optional[Tuple[int, np.ndarray]]:
        """Return (n_pages_total, data[new_pages, L, ...]) for the cached
        page-aligned prefix of `token_ids`, skipping the first
        `have_pages` pages; None if the source has nothing new."""
        raise NotImplementedError

    def close(self) -> None:
        pass


def _engine_fetch(engine, token_ids, have_pages):
    """Source-side lookup: radix match + device->host gather."""
    sched = engine.scheduler
    ps = sched.page_size
    aligned = (len(token_ids) // ps) * ps
    if aligned <= 0:
        return None
    m = sched.radix_cache.match_prefix(token_ids[:aligned])
    n_pages = m.length // ps
    if n_pages <= have_pages:
        return None
    data = engine.runner.gather_kv_pages(list(m.pages[have_pages:n_pages]))
    return n_pages, data


def _run_exclusive(engine, fn):
    """Run `fn` serialized against the engine's scheduler thread (pump
    inbox when a TokenizerManager is live; direct call otherwise)."""
    tm = getattr(engine, "tm", None)
    if tm is None:
        return fn()
    done = threading.Event()
    box = {}

    def call():
        try:
            box["r"] = fn()
        except Exception as e:  # propagate to the waiting thread
            box["e"] = e
        finally:
            done.set()

    tm._inbox.put(("call_sync", call))
    if not done.wait(timeout=120):
        raise TimeoutError("engine busy: exclusive KV fetch timed out")
    if "e" in box:
        raise box["e"]
    return box["r"]


class LocalKVBackend(KVTransferBackend):
    """In-process fast path (same-host PD pair shares the process)."""

    def __init__(self, src_engine):
        self.src = src_engine

    def fetch(self, token_ids, have_pages):
        return _run_exclusive(
            self.src, lambda: _engine_fetch(self.src, token_ids, have_pages)
        )


class FakeKVBackend(KVTransferBackend):
    """Test seam (reference `fake/conn.py:22`): records every fetch and
    optionally injects failures, delegating to a real backend."""

    def __init__(self, inner: KVTransferBackend, fail_every: int = 0):
        self.inner = inner
        self.calls: list = []
        self.fail_every = fail_every

    def fetch(self, token_ids, have_pages):
        self.calls.append((list(token_ids), have_pages))
        if self.fail_every and len(self.calls) % self.fail_every == 0:
            raise ConnectionError("injected transfer failure")
        return self.inner.fetch(token_ids, have_pages)


def _recv_exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(min(1 << 20, n - len(buf)))
        if not chunk:
            raise ConnectionError("kv transfer peer closed")
        buf += chunk
    return bytes(buf)


class KVTransferServer:
    """Prefill-side TCP server answering content-keyed KV fetches."""

    def __init__(self, engine, host: str = "0.0.0.0", port: int = 0):
        self.engine = engine
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self):
                sock = self.request
                try:
                    while True:
                        (hlen,) = struct.unpack(
                            "<I", _recv_exact(sock, 4)
                        )
                        req = json.loads(_recv_exact(sock, hlen))
                        if req.get("cmd") != "fetch":
                            break
                        r = _run_exclusive(
                            outer.engine,
                            lambda: _engine_fetch(
                                outer.engine,
                                req["token_ids"],
                                req.get("have", 0),
                            ),
                        )
                        if r is None:
                            hdr = json.dumps({"tokens": 0}).encode()
                            sock.sendall(struct.pack("<I", len(hdr)) + hdr)
                            continue
                        n_pages, data = r
                        data = np.ascontiguousarray(data)
                        hdr = json.dumps(
                            {
                                "tokens": n_pages
                                * outer.engine.scheduler.page_size,
                                "pages": n_pages,
                                "shape": list(data.shape),
                                "dtype": str(data.dtype),
                            }
                        ).encode()
                        sock.sendall(struct.pack("<I", len(hdr)) + hdr)
                        sock.sendall(data.tobytes())
                except (ConnectionError, OSError):
                    pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._server = Server((host, port), Handler)
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(
            target=self._server.serve_forever, daemon=True
        )
        self._thread.start()
        logger.info("KV transfer server on %s:%d", host, self.port)

    def close(self):
        self._server.shutdown()
        self._server.server_close()


class TCPKVBackend(KVTransferBackend):
    """Decode-side client of a KVTransferServer (cross-host DCN path)."""

    def __init__(self, addr: str):
        host, _, port = addr.rpartition(":")
        self._sock = socket.create_connection((host, int(port)), timeout=60)
        self._lock = threading.Lock()

    def fetch(self, token_ids, have_pages):
        req = json.dumps(
            {"cmd": "fetch", "token_ids": list(map(int, token_ids)),
             "have": int(have_pages)}
        ).encode()
        with self._lock:
            self._sock.sendall(struct.pack("<I", len(req)) + req)
            (hlen,) = struct.unpack("<I", _recv_exact(self._sock, 4))
            hdr = json.loads(_recv_exact(self._sock, hlen))
            if hdr.get("tokens", 0) <= 0:
                return None
            nbytes = int(np.prod(hdr["shape"])) * np.dtype(
                hdr["dtype"]
            ).itemsize
            raw = _recv_exact(self._sock, nbytes)
        data = np.frombuffer(raw, dtype=hdr["dtype"]).reshape(hdr["shape"])
        return hdr["pages"], data

    def close(self):
        try:
            self._sock.close()
        except OSError:
            pass
