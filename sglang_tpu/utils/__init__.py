"""Shared utilities for the TPU-native serving engine.

Role parity with the reference's `python/sglang/srt/utils/` grab-bag
(`srt/utils/common.py`), re-designed minimally: logging, env parsing,
alignment helpers, and small data helpers used across the stack.
"""

from __future__ import annotations

import logging
import os
import sys
import time
from typing import Any, Iterable, Sequence

_LOG_FORMAT = "[%(asctime)s %(name)s %(levelname)s] %(message)s"


def configure_logger(level: int | str = logging.INFO) -> None:
    logging.basicConfig(
        level=level,
        format=_LOG_FORMAT,
        datefmt="%H:%M:%S",
        stream=sys.stdout,
        force=False,
    )


def get_logger(name: str) -> logging.Logger:
    return logging.getLogger(name)


def get_bool_env_var(name: str, default: str = "false") -> bool:
    return os.getenv(name, default).lower() in ("true", "1", "yes", "on")


def get_int_env_var(name: str, default: int) -> int:
    try:
        return int(os.getenv(name, str(default)))
    except ValueError:
        return default


def cdiv(a: int, b: int) -> int:
    """Ceiling division."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    """Round x up to the nearest multiple of m."""
    return cdiv(x, m) * m


def round_down(x: int, m: int) -> int:
    return (x // m) * m


def next_power_of_2(x: int) -> int:
    if x <= 1:
        return 1
    return 1 << (x - 1).bit_length()


def pad_to_bucket(x: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= x. Buckets must be sorted ascending; the last
    bucket is the hard cap (raises if exceeded). This is the TPU analogue
    of CUDA-graph batch-size buckets (reference
    `model_executor/cuda_graph_runner.py:578`): every jitted step runs at a
    bucketed static shape so the XLA compilation cache acts as the graph
    cache."""
    for b in buckets:
        if b >= x:
            return b
    raise ValueError(f"{x} exceeds largest bucket {buckets[-1]}")


def flatten(list_of_lists: Iterable[Iterable[Any]]) -> list:
    return [x for sub in list_of_lists for x in sub]


class Timer:
    """Context-manager wall-clock timer (seconds in `.elapsed`)."""

    def __enter__(self):
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.start
        return False


def dataclass_to_string_truncated(obj: Any, max_len: int = 512) -> str:
    s = repr(obj)
    return s if len(s) <= max_len else s[: max_len - 3] + "..."
