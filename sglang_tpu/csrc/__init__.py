"""Native host-side components (C++, ctypes-bound).

Parity with the reference's C++ runtime pieces (`mem_cache/cpp_radix_tree/
tree_v2.cpp`, `speculative/cpp_ngram/ngram.cpp`). Built lazily with g++ on
first use and cached; every consumer has a pure-Python fallback, so the
engine works even without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)

_SRC = os.path.join(os.path.dirname(__file__), "radix_tree.cpp")
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[str]:
    cache_dir = os.environ.get(
        "SGLANG_TPU_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), "sglang_tpu_native")
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, "libsglang_tpu_native.so")
    if os.path.exists(so_path) and os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", so_path],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return so_path
    except (subprocess.CalledProcessError, FileNotFoundError, subprocess.TimeoutExpired) as e:
        logger.warning("native build failed (%s); using Python fallbacks", e)
        return None


def get_native_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SGLANG_TPU_DISABLE_NATIVE") == "1":
        return None
    so = _build_lib()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    c_i32p = ctypes.POINTER(ctypes.c_int32)
    lib.rt_new.restype = ctypes.c_void_p
    lib.rt_new.argtypes = [ctypes.c_int]
    lib.rt_free.argtypes = [ctypes.c_void_p]
    lib.rt_reset.argtypes = [ctypes.c_void_p]
    lib.rt_match.restype = ctypes.c_int64
    lib.rt_match.argtypes = [
        ctypes.c_void_p, c_i32p, ctypes.c_int64, c_i32p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.rt_lock.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int]
    lib.rt_insert.restype = ctypes.c_int64
    lib.rt_insert.argtypes = [
        ctypes.c_void_p, c_i32p, ctypes.c_int64, c_i32p, c_i32p, ctypes.c_int64,
    ]
    lib.rt_evict.restype = ctypes.c_int64
    lib.rt_evict.argtypes = [ctypes.c_void_p, ctypes.c_int64, c_i32p, ctypes.c_int64]
    lib.rt_evictable_pages.restype = ctypes.c_int64
    lib.rt_evictable_pages.argtypes = [ctypes.c_void_p]
    lib.rt_total_pages.restype = ctypes.c_int64
    lib.rt_total_pages.argtypes = [ctypes.c_void_p]
    lib.ngram_propose.restype = ctypes.c_int64
    lib.ngram_propose.argtypes = [
        c_i32p, ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int, c_i32p,
    ]
    _LIB = lib
    logger.info("native host components loaded from %s", so)
    return lib
