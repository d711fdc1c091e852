"""Pluggable L3 KV storage backends for HiCache.

Parity with reference `srt/mem_cache/hicache_storage.py` +
`srt/mem_cache/storage/{mooncake_store,hf3fs,lmcache,nixl,eic}`: the
host-RAM tier spills LRU pages into a byte-addressed store and promotes
them back on hit. Backends implement four methods over raw page bytes —
remote stores (mooncake/hf3fs/nixl-class) slot in behind the same
interface; this build ships the file backend and a Redis backend.

Selected from `--hicache-storage-dir`: a `redis://host[:port]/prefix`
URL picks Redis; any other value is a local directory.
"""

from __future__ import annotations

from typing import Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class KVStorageBackend:
    """Byte store keyed by page chain-id."""

    def put(self, cid: int, data: bytes) -> None:
        raise NotImplementedError

    def get(self, cid: int) -> Optional[bytes]:
        raise NotImplementedError

    def delete(self, cid: int) -> None:
        raise NotImplementedError


class FileKVStorage(KVStorageBackend):
    """One file per page in a local directory (the reference file
    backend; also the shape of an hf3fs-style mounted-FS store)."""

    def __init__(self, directory: str):
        import os

        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    def _path(self, cid: int) -> str:
        import os

        return os.path.join(self.dir, f"kv_{cid}.bin")

    def put(self, cid: int, data: bytes) -> None:
        with open(self._path(cid), "wb") as f:
            f.write(data)

    def get(self, cid: int) -> Optional[bytes]:
        try:
            with open(self._path(cid), "rb") as f:
                return f.read()
        except OSError:
            return None

    def delete(self, cid: int) -> None:
        import os

        try:
            os.remove(self._path(cid))
        except OSError:
            pass


class RedisKVStorage(KVStorageBackend):
    """Remote KV page store over Redis (the reference's remote-store
    class — lmcache/mooncake-style shared cache across engines).

    `client` injection keeps tests hermetic; production constructs a
    redis-py client from the URL (redis-py is not in the base image —
    install it to use this backend)."""

    def __init__(self, url: str, client=None):
        rest = url[len("redis://"):]
        host_part, _, prefix = rest.partition("/")
        host, _, port = host_part.partition(":")
        self.prefix = prefix or "sglang_kv"
        if client is None:
            try:
                import redis
            except ImportError as e:
                raise RuntimeError(
                    "redis:// hicache storage needs the redis-py package"
                ) from e
            client = redis.Redis(host=host or "localhost",
                                 port=int(port or 6379))
        self.client = client

    def _key(self, cid: int) -> str:
        return f"{self.prefix}:{cid}"

    def put(self, cid: int, data: bytes) -> None:
        self.client.set(self._key(cid), data)

    def get(self, cid: int) -> Optional[bytes]:
        v = self.client.get(self._key(cid))
        return bytes(v) if v is not None else None

    def delete(self, cid: int) -> None:
        self.client.delete(self._key(cid))


def create_storage_backend(
    spec: Optional[str], client=None
) -> Optional[KVStorageBackend]:
    if not spec:
        return None
    if spec.startswith("redis://"):
        return RedisKVStorage(spec, client=client)
    return FileKVStorage(spec)
