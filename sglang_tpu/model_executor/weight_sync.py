"""Distributed weight sync for RL training loops.

Parity with reference `model_runner.py:1980 update_weights_from_distributed`
+ `init_weights_update_group` — there, the engine joins the trainer's NCCL
group and receives broadcast tensors. TPU redesign: weights cross hosts on
DCN, so the transport is a length-prefixed TCP stream (the same wire
pattern as `disaggregation/conn.py`): the engine opens a receiver, the
trainer pushes (name, ndarray) batches with `push_weights`, and the engine
applies each batch atomically via `update_weights_from_tensor` (fused
targets quantize on ingest, the params treedef never changes, every
compiled step stays valid).

Wire format per batch:
    u32 count, then per tensor:
      u16 name_len | name utf-8 | u8 dtype_len | dtype str |
      u8 ndim | u32 dims... | u64 nbytes | raw bytes
    trailing u32 0xFFFFFFFF sentinel closes the batch.
"""

from __future__ import annotations

import socket
import struct
import threading
from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise ConnectionError("weight-sync peer closed")
        buf += chunk
    return bytes(buf)


def _send_tensor(sock: socket.socket, name: str, arr: np.ndarray) -> None:
    nb = name.encode()
    dt = arr.dtype.str.encode()
    hdr = struct.pack("<H", len(nb)) + nb
    hdr += struct.pack("<B", len(dt)) + dt
    hdr += struct.pack("<B", arr.ndim) + struct.pack(
        f"<{arr.ndim}I", *arr.shape
    )
    data = np.ascontiguousarray(arr).tobytes()
    hdr += struct.pack("<Q", len(data))
    sock.sendall(hdr)
    sock.sendall(data)


def _recv_tensor(sock: socket.socket) -> Tuple[str, np.ndarray]:
    (nlen,) = struct.unpack("<H", _recv_exact(sock, 2))
    name = _recv_exact(sock, nlen).decode()
    (dlen,) = struct.unpack("<B", _recv_exact(sock, 1))
    dtype = np.dtype(_recv_exact(sock, dlen).decode())
    (ndim,) = struct.unpack("<B", _recv_exact(sock, 1))
    shape = struct.unpack(f"<{ndim}I", _recv_exact(sock, 4 * ndim))
    (nbytes,) = struct.unpack("<Q", _recv_exact(sock, 8))
    arr = np.frombuffer(_recv_exact(sock, nbytes), dtype=dtype).reshape(shape)
    return name, arr


def push_weights(addr: Tuple[str, int], named_tensors) -> int:
    """Trainer side: push one batch of (hf_name, ndarray) pairs."""
    items = list(named_tensors)
    with socket.create_connection(addr, timeout=60) as sock:
        sock.sendall(struct.pack("<I", len(items)))
        for name, arr in items:
            _send_tensor(sock, name, np.asarray(arr))
        sock.sendall(struct.pack("<I", 0xFFFFFFFF))
        # wait for the engine's ack (count of applied weight groups)
        (applied,) = struct.unpack("<i", _recv_exact(sock, 4))
    return applied


class WeightSyncReceiver:
    """Engine side: listens for trainer pushes and applies them through a
    caller-supplied apply(named_tensors) -> int (runs on the scheduler
    thread so forwards never race a weight swap)."""

    def __init__(self, apply_fn, host: str = "0.0.0.0", port: int = 0):
        self.apply_fn = apply_fn
        self._srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((host, port))
        self._srv.listen(4)
        self.port = self._srv.getsockname()[1]
        self.applied_names: List[str] = []
        self.versions = 0
        self._lock = threading.Lock()
        self._stop = False
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        logger.info("weight-sync receiver on port %d", self.port)

    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            try:
                (count,) = struct.unpack("<I", _recv_exact(conn, 4))
                tensors = [_recv_tensor(conn) for _ in range(count)]
                (sentinel,) = struct.unpack("<I", _recv_exact(conn, 4))
                assert sentinel == 0xFFFFFFFF
                applied = self.apply_fn(tensors)
                with self._lock:
                    self.applied_names.extend(n for n, _ in tensors)
                    self.versions += 1
                conn.sendall(struct.pack("<i", int(applied)))
            except Exception as e:  # keep serving after a bad push
                logger.warning("weight push failed: %s", e)
                try:
                    conn.sendall(struct.pack("<i", -1))
                except Exception:
                    pass
            finally:
                conn.close()

    def wait_version(self, version: int, timeout: float = 120.0) -> bool:
        import time

        deadline = time.monotonic() + timeout
        while time.monotonic() < deadline:
            with self._lock:
                if self.versions >= version:
                    return True
            time.sleep(0.01)
        return False

    def close(self):
        self._stop = True
        try:
            self._srv.close()
        except Exception:
            pass
