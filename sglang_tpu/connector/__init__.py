"""Remote weight connectors (reference `srt/connector/{s3,redis}.py` +
remote model loaders, `model_loader/loader.py:1531 RemoteModelLoader`).

`resolve_model_path` turns a model-path URI into a local checkpoint
directory, downloading into `~/.cache/sglang_tpu/models/<digest>` when the
source is remote:

  /local/dir          -> unchanged
  file:///local/dir   -> /local/dir
  s3://bucket/prefix  -> downloaded via boto3 (gated on availability)
  redis://host/key    -> blobs `key/<filename>` fetched via redis-py

Engines call this once at config-load time; everything downstream (the
safetensors index, tokenizer init) sees an ordinary directory.
"""

from __future__ import annotations

import hashlib
import os
from urllib.parse import urlparse

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

CACHE_ROOT = os.path.expanduser(
    os.environ.get("SGLANG_TPU_MODEL_CACHE", "~/.cache/sglang_tpu/models")
)


def _cache_dir(uri: str) -> str:
    d = os.path.join(CACHE_ROOT, hashlib.sha256(uri.encode()).hexdigest()[:16])
    os.makedirs(d, exist_ok=True)
    return d


def resolve_model_path(model_path: str) -> str:
    if "://" not in model_path:
        return model_path
    scheme = urlparse(model_path).scheme
    if scheme == "file":
        return urlparse(model_path).path
    if scheme == "s3":
        return _fetch_s3(model_path)
    if scheme == "redis":
        return _fetch_redis(model_path)
    raise ValueError(f"unsupported model-path scheme: {scheme}://")


def _fetch_s3(uri: str) -> str:
    try:
        import boto3
    except ImportError as e:
        raise RuntimeError(
            "s3:// model paths need boto3 (not installed in this image); "
            "download the checkpoint and pass a local path"
        ) from e
    p = urlparse(uri)
    bucket, prefix = p.netloc, p.path.lstrip("/")
    dst = _cache_dir(uri)
    marker = os.path.join(dst, ".complete")
    if os.path.exists(marker):
        return dst
    s3 = boto3.client("s3")
    paginator = s3.get_paginator("list_objects_v2")
    n = 0
    for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
        for obj in page.get("Contents", []):
            rel = os.path.relpath(obj["Key"], prefix)
            out = os.path.join(dst, rel)
            os.makedirs(os.path.dirname(out), exist_ok=True)
            s3.download_file(bucket, obj["Key"], out)
            n += 1
    if n == 0:
        raise FileNotFoundError(f"no objects under {uri}")
    open(marker, "w").close()
    logger.info("fetched %d objects from %s", n, uri)
    return dst


def _fetch_redis(uri: str) -> str:
    try:
        import redis
    except ImportError as e:
        raise RuntimeError(
            "redis:// model paths need redis-py (not installed in this "
            "image); download the checkpoint and pass a local path"
        ) from e
    p = urlparse(uri)
    r = redis.Redis(host=p.hostname, port=p.port or 6379)
    key_prefix = p.path.lstrip("/")
    dst = _cache_dir(uri)
    marker = os.path.join(dst, ".complete")
    if os.path.exists(marker):
        return dst
    names = r.smembers(f"{key_prefix}/__files__")
    if not names:
        raise FileNotFoundError(f"no file set at {uri}/__files__")
    for name in sorted(names):
        name = name.decode() if isinstance(name, bytes) else name
        blob = r.get(f"{key_prefix}/{name}")
        out = os.path.join(dst, name)
        os.makedirs(os.path.dirname(out), exist_ok=True)
        with open(out, "wb") as f:
            f.write(blob)
    open(marker, "w").close()
    return dst
