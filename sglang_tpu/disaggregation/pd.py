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


def transfer_prefix_kv(src_engine, dst_engine, token_ids: List[int]) -> int:
    """Move the page-aligned KV prefix for `token_ids` from src to dst.

    Returns tokens transferred (0 if src has nothing cached). The pages
    land in dst's radix tree (tree-owned, evictable), exactly like a
    HiCache prefetch — dst's scheduler sees them as local cache.
    """
    src_sched = src_engine.scheduler
    dst_sched = dst_engine.scheduler
    ps = src_sched.page_size
    assert ps == dst_sched.page_size, "page_size must match across PD pair"

    aligned = (len(token_ids) // ps) * ps
    if aligned <= 0:
        return 0
    m = src_sched.radix_cache.match_prefix(token_ids[:aligned])
    n_pages = m.length // ps
    if n_pages == 0:
        return 0
    # skip what dst already has
    md = dst_sched.radix_cache.match_prefix(token_ids[: m.length])
    have = md.length // ps
    if have >= n_pages:
        return 0
    src_pages = list(m.pages[:n_pages])

    data = src_engine.runner.gather_kv_pages(src_pages[have:n_pages])
    new_pages = dst_sched.allocator.alloc(n_pages - have)
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


class PDOrchestrator:
    """Conduct one request across a prefill engine and a decode engine
    (reference `disaggregation` PrefillBootstrapQueue + DecodeQueue roles,
    in-process)."""

    def __init__(self, prefill_engine, decode_engine):
        self.prefill = prefill_engine
        self.decode = decode_engine
        self.tokens_transferred = 0
        self.requests_served = 0

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

        # 2) move the prefix KV to the decode engine
        full = list(input_ids) + first_ids
        self.tokens_transferred += transfer_prefix_kv(
            self.prefill, self.decode, full
        )

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
