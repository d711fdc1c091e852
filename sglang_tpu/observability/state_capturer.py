"""Crash-dump state capture (reference `srt/state_capturer/` + the
tokenizer crash dump, `tokenizer_manager.py:169`).

On an engine-fatal exception the serving state — live requests, queue
depths, allocator/radix occupancy, scheduler counters, server args, and
the traceback — is serialized to a timestamped JSON file so postmortems
do not depend on scraping logs. Enabled with `--crash-dump-dir`.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
import traceback
from typing import Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def capture_state(scheduler) -> dict:
    """Snapshot the scheduler's serving state (host-side only; never
    touches the device)."""

    def req_view(r):
        return {
            "rid": r.rid,
            "status": str(getattr(r, "status", "")),
            "prompt_tokens": len(r.input_ids),
            "output_tokens": len(r.output_ids),
            "kv_len": getattr(r, "kv_len", None),
            "pages_held": len(getattr(r, "pages", []) or []),
            "priority": getattr(r, "priority", 0),
            "retractions": getattr(r, "retract_count", 0),
            "finish_reason": (
                r.finished_reason.kind
                if getattr(r, "finished_reason", None)
                else None
            ),
        }

    stats = scheduler.stats
    return {
        "ts": time.time(),
        "running": [req_view(r) for r in scheduler.running_batch.reqs],
        "waiting": [req_view(r) for r in scheduler.waiting_queue],
        "chunked": (
            req_view(scheduler.chunked_req) if scheduler.chunked_req else None
        ),
        "inflight": scheduler._inflight is not None,
        "chain_rows": (
            len(scheduler._chain_rows)
            if scheduler._chain_rows is not None
            else None
        ),
        "deferred_zombies": len(scheduler._deferred),
        "allocator": {
            "available_pages": scheduler.allocator.available_pages(),
            "total_pages": scheduler.runner.num_pages,
        },
        "radix": {
            "total_pages": scheduler.radix_cache.total_pages,
            "evictable_pages": scheduler.radix_cache.evictable_pages,
        },
        "stats": {
            k: v
            for k, v in vars(stats).items()
            if isinstance(v, (int, float))
        },
        "stage_time": dict(stats.stage_time),
        "server_args": {
            k: v
            for k, v in dataclasses.asdict(scheduler.server_args).items()
            if isinstance(v, (int, float, str, bool, type(None), list))
        },
    }


def write_crash_dump(
    scheduler, exc: BaseException, dump_dir: Optional[str]
) -> Optional[str]:
    """Serialize state + traceback; returns the dump path (None when
    disabled or the dump itself fails — a crash dump must never mask the
    original failure)."""
    if not dump_dir:
        return None
    try:
        os.makedirs(dump_dir, exist_ok=True)
        state = capture_state(scheduler)
        state["exception"] = {
            "type": type(exc).__name__,
            "message": str(exc),
            "traceback": traceback.format_exception(exc),
        }
        path = os.path.join(
            dump_dir, f"crash_{time.strftime('%Y%m%d_%H%M%S')}_{os.getpid()}.json"
        )
        with open(path, "w") as f:
            json.dump(state, f, indent=1, default=str)
        logger.error("crash state dumped to %s", path)
        return path
    except Exception:
        logger.exception("crash dump failed")
        return None
