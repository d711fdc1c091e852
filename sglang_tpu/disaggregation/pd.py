"""Prefill/decode disaggregation.

Parity with reference `srt/disaggregation/` (prefill servers compute
prompt KV, decode servers continue generation; KV moves through a
transfer engine — mooncake/nixl — coordinated by a bootstrap queue).

TPU-native v1 shape: the transfer unit is the page-aligned prefix KV,
moved as ONE batched all-layer host round-trip per request using the
same `gather_kv_pages` / `scatter_kv_pages` primitives as the HiCache
tier, and PUBLISHED through the destination's radix tree — so the decode
engine picks the transferred prefix up as an ordinary local cache hit
and recomputes only the unaligned tail. This makes the data plane
correct and testable in-process today; swapping the host hop for a
direct device-to-device `jax.device_put` over ICI/DCN (and adding the
bootstrap/registration service for cross-host fleets) is the r2/r3
transport upgrade, reference `disaggregation/mooncake/conn.py` analogue.

The orchestrator mirrors the reference's conductor role: prefill engine
produces (first token, prefix KV), the KV transfers, and the decode
engine continues — output is identical to a single engine running the
whole request (asserted in tests).
"""

from __future__ import annotations

from typing import Dict, List, Optional

from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


def receive_prefix_kv(backend, dst_engine, token_ids: List[int]) -> int:
    """Pull the page-aligned KV prefix for `token_ids` through a transfer
    backend (`disaggregation/conn.py`) and publish it into dst's radix
    tree (tree-owned, evictable) — dst's scheduler then sees it as an
    ordinary local cache hit. Returns tokens transferred."""
    dst_sched = dst_engine.scheduler
    ps = dst_sched.page_size
    aligned = (len(token_ids) // ps) * ps
    if aligned <= 0:
        return 0
    md = dst_sched.radix_cache.match_prefix(token_ids[:aligned])
    have = md.length // ps
    r = backend.fetch(token_ids, have)
    if r is None:
        return 0
    n_pages, data = r
    rank = (
        dst_sched.allocator.page_rank(md.pages[0])
        if have
        else dst_sched.allocator.least_loaded_rank()
    )
    new_pages = dst_sched.allocator.alloc(n_pages - have, rank=rank)
    if new_pages is None:
        return 0
    dst_engine.runner.scatter_kv_pages(new_pages, data)
    dst_sched.radix_cache.insert(
        token_ids[: n_pages * ps], list(md.pages[:have]) + new_pages
    )
    dst_sched.allocator.free(new_pages)  # tree holds its own ref
    moved = (n_pages - have) * ps
    logger.debug("pd transfer: %d tokens (%d pages)", moved, n_pages - have)
    return moved


def transfer_prefix_kv(src_engine, dst_engine, token_ids: List[int]) -> int:
    """Same-process PD pair: pull through the in-process fast path."""
    from sglang_tpu.disaggregation.conn import LocalKVBackend

    assert src_engine.scheduler.page_size == dst_engine.scheduler.page_size
    return receive_prefix_kv(
        LocalKVBackend(src_engine), dst_engine, token_ids
    )


class PDOrchestrator:
    """Conduct one request across a prefill engine and a decode engine
    (reference `disaggregation` PrefillBootstrapQueue + DecodeQueue roles,
    in-process)."""

    def __init__(self, prefill_engine, decode_engine, backend=None):
        """`backend` is a `conn.KVTransferBackend` (TCP for cross-host,
        fake for tests); defaults to the in-process fast path."""
        self.prefill = prefill_engine
        self.decode = decode_engine
        self.backend = backend
        self.tokens_transferred = 0
        self.requests_served = 0

    def _backend(self):
        if self.backend is None:
            from sglang_tpu.disaggregation.conn import LocalKVBackend

            self.backend = LocalKVBackend(self.prefill)
        return self.backend

    def generate(
        self,
        input_ids: List[int],
        sampling_params: Optional[Dict] = None,
    ) -> Dict:
        sp = dict(sampling_params or {})
        max_new = sp.get("max_new_tokens", 128)

        # 1) prefill engine: compute prompt KV + the first token
        sp_prefill = dict(sp, max_new_tokens=1)
        first = self.prefill.generate(
            input_ids=list(input_ids), sampling_params=sp_prefill
        )
        first_ids = first["output_ids"]
        fr = (first.get("meta_info") or {}).get("finish_reason") or {}
        if max_new <= 1 or fr.get("type") == "stop":
            self.requests_served += 1
            return first

        # 2) move the prefix KV to the decode engine; a transfer failure
        # degrades to recompute on the decode side (correctness is
        # radix-natural: missing prefix KV just means a longer prefill)
        full = list(input_ids) + first_ids
        try:
            self.tokens_transferred += receive_prefix_kv(
                self._backend(), self.decode, full
            )
        except (ConnectionError, TimeoutError, OSError) as e:
            logger.warning("pd transfer failed, decode recomputes: %s", e)

        # 3) decode engine continues from prompt + first token
        sp_decode = dict(sp, max_new_tokens=max_new - 1)
        rest = self.decode.generate(input_ids=full, sampling_params=sp_decode)

        out = dict(rest)
        out["output_ids"] = first_ids + rest["output_ids"]
        meta = dict(rest.get("meta_info") or {})
        meta["prompt_tokens"] = len(input_ids)
        meta["completion_tokens"] = len(out["output_ids"])
        meta["pd_transferred_tokens"] = self.tokens_transferred
        out["meta_info"] = meta
        self.requests_served += 1
        return out
