"""Request ordering + token-budget admission.

Parity with reference `srt/managers/schedule_policy.py`
(`SchedulePolicy:143` cache-aware `lpm`/`dfs-weight` and cache-agnostic
`fcfs`/`lof`/`random`/`priority` orders `:127-141`; `PrefillAdder:410`
token-budget admission with chunked prefill and headroom for in-flight
decodes `:506`).

TPU note: admission must also respect the prefill token *bucket* ladder —
the adder caps each round at the largest prefill bucket so the jitted extend
step never exceeds a compiled shape.
"""

from __future__ import annotations

import random
from typing import List, Optional

from sglang_tpu.managers.schedule_batch import Req
from sglang_tpu.mem_cache.allocator import PageAllocator
from sglang_tpu.mem_cache.radix_cache import RadixCache
from sglang_tpu.utils import cdiv, get_logger, round_down

logger = get_logger(__name__)

# Treat requests with long cached prefixes as "in-batch dedup" candidates
# like the reference's IN_BATCH_PREFIX_CACHING thresholds.
RETRACT_DECODE_HEADROOM_STEPS = 20

# Adaptive decode-headroom ratio (reference `scheduler.py` new_token_ratio):
# admission reserves `ratio * remaining_new_tokens` KV per request. Starts
# conservative, decays toward MIN while no retractions happen, and jumps
# back up on every retraction — so steady workloads converge to the exact
# reservation their output lengths need without hand tuning.
INIT_NEW_TOKEN_RATIO = 0.7
MIN_NEW_TOKEN_RATIO = 0.3
NEW_TOKEN_RATIO_DECAY = 0.001  # per prefill admission round
NEW_TOKEN_RATIO_RETRACT_BUMP = 0.2


def req_decode_reserve(
    req: Req,
    ratio: float,
    lookahead: int,
    page_size: int = 1,
    base_len: Optional[int] = None,
) -> int:
    """KV tokens reserved for one request's future decode output: the
    ratio-scaled remaining output, floored at the bounded headroom plus
    the decode chain's per-row lookahead (a multi-step chunk allocates
    `k` tokens per row up front even for nearly-finished requests).

    `remaining` is clipped before scaling (reference CLIP_MAX_NEW_TOKENS):
    a context-length max_new_tokens would otherwise reserve more than the
    whole pool and starve the request in the waiting queue forever.

    The reserve is PAGE-aware: allocation happens in pages, so the true
    future allocation is cdiv(base+est, ps)*ps - cdiv(base, ps)*ps, not
    `est` tokens. Token-granular reserves under-counted ~ps/2 tokens per
    request (half-page tail), which over-admitted ~8 requests per bench
    pass and caused a retract/re-prefill churn cycle."""
    from sglang_tpu.managers.schedule_batch import CLIP_MAX_NEW_TOKENS_ESTIMATE

    remaining = req.sampling_params.max_new_tokens - len(req.output_ids)
    clipped = min(remaining, CLIP_MAX_NEW_TOKENS_ESTIMATE)
    if req.sampling_params.ignore_eos:
        # ignore_eos generates EXACTLY max_new_tokens: the remaining output
        # is known, not an estimate — reserve it fully. The ratio discount
        # models early EOS, which cannot happen here; discounting admits
        # requests that are guaranteed to be retracted later (measured:
        # 26 retract/re-prefill cycles per bench pass at ratio 0.7).
        ratio = 1.0
    est = int(
        max(
            clipped * ratio,
            min(remaining, RETRACT_DECODE_HEADROOM_STEPS) + lookahead,
        )
    )
    if page_size > 1:
        base = base_len if base_len is not None else req.kv_len
        up = -(-(base + est) // page_size) * page_size
        held = -(-base // page_size) * page_size
        return up - held
    return est


def total_decode_reserve(
    reqs: List[Req], ratio: float, lookahead: int, page_size: int = 1
) -> int:
    return sum(
        req_decode_reserve(r, ratio, lookahead, page_size) for r in reqs
    )


class SchedulePolicy:
    """Orders the waiting queue; cache-aware policies consult the radix tree."""

    CACHE_AWARE = ("lpm", "dfs-weight")

    def __init__(self, policy: str, radix_cache: RadixCache):
        self.policy = policy
        self.radix_cache = radix_cache

    def calc_priority(self, waiting_queue: List[Req]) -> None:
        policy = self.policy
        if policy in self.CACHE_AWARE and self.radix_cache.disable:
            policy = "fcfs"
        if policy == "fcfs":
            waiting_queue.sort(key=lambda r: r.arrival_time)
        elif policy == "lof":  # longest output first
            waiting_queue.sort(key=lambda r: -r.sampling_params.max_new_tokens)
        elif policy == "random":
            random.shuffle(waiting_queue)
        elif policy == "priority":
            waiting_queue.sort(key=lambda r: (-r.priority, r.arrival_time))
        elif policy in self.CACHE_AWARE:
            # Longest-prefix-match first: re-match each waiting request
            # against the current tree (reference `schedule_policy.py:164`).
            for r in waiting_queue:
                m = self.radix_cache.match_prefix(r.cache_ids)
                r._match_len = m.length
            waiting_queue.sort(key=lambda r: (-r._match_len, r.arrival_time))
        else:
            raise ValueError(f"unknown schedule policy {policy}")


class AddReqResult:
    CONTINUE = 0  # keep admitting
    NO_TOKEN = 1  # out of token budget / pool space
    OTHER = 2  # hit request cap or chunked stop


class PrefillAdder:
    """Admits waiting requests into one extend batch under token budgets.

    Budgets (reference `PrefillAdder.__init__`, `schedule_policy.py:410`):
    - `rem_input_tokens`: per-round compute budget (max_prefill_tokens,
      capped to the largest compiled prefill bucket).
    - `rem_chunk_tokens`: chunked-prefill cap; a request whose remaining
      prefill exceeds it is admitted truncated (is_chunked=True).
    - `rem_total_tokens`: KV headroom — free pool + evictable radix pages
      minus a per-running-request decode reserve, so admitting prefills
      can't immediately starve running decodes into retraction.
    """

    def __init__(
        self,
        allocator: PageAllocator,
        radix_cache: RadixCache,
        running_reqs: List[Req],
        max_prefill_tokens: int,
        chunked_prefill_size: int,
        max_batch_tokens: int,
        conservativeness: float = 1.0,
        page_size: int = 1,
        new_token_ratio: float = 1.0,
        decode_lookahead: int = 0,
    ):
        self.allocator = allocator
        self.radix_cache = radix_cache
        self.page_size = page_size
        self.new_token_ratio = new_token_ratio
        self.decode_lookahead = decode_lookahead
        self.rem_input_tokens = min(max_prefill_tokens, max_batch_tokens)
        self.rem_chunk_tokens = chunked_prefill_size
        # Reserve `ratio * remaining_new_tokens` per running request —
        # but never less than the decode chain's per-row page lookahead
        # (zombie chains preallocate `horizon*k` tokens per row up front,
        # which can exceed a nearly-finished request's remaining output).
        decode_reserve = int(
            total_decode_reserve(
                running_reqs, new_token_ratio, decode_lookahead, page_size
            )
            * conservativeness
        )
        self.rem_total_tokens = (
            allocator.available_tokens()
            + radix_cache.evictable_pages * page_size
            - decode_reserve
        )
        self.can_run_list: List[Req] = []
        self.new_chunked_req: Optional[Req] = None
        self.log_hit_tokens = 0
        self.log_input_tokens = 0

    def add_chunked_req(self, req: Req) -> bool:
        """Re-admit the in-flight chunked request first (reference
        `PrefillAdder.add_chunked_req`). Returns True if it is still chunked
        after this round."""
        remaining = len(req.fill_ids) - req.kv_len
        take = min(remaining, self.rem_chunk_tokens, self.rem_input_tokens)
        take = self._align_chunk(req, take, remaining)
        if take <= 0:
            return True
        req._extend_len = take
        req.is_chunked = take < remaining
        self.can_run_list.append(req)
        self.rem_input_tokens -= take
        self.rem_chunk_tokens -= take
        if req.is_chunked:
            self.new_chunked_req = req
        self.log_input_tokens += take
        return req.is_chunked

    def _align_chunk(self, req: Req, take: int, remaining: int) -> int:
        """Chunk boundaries stay page-aligned so radix insertion of the
        chunked prefix is possible and the next chunk starts on a page."""
        if take >= remaining:
            return remaining
        return round_down(take, self.page_size)

    def add_one_req(self, req: Req) -> int:
        """Try to admit `req`. Returns an AddReqResult code."""
        if self.rem_input_tokens <= 0 or self.rem_chunk_tokens <= 0:
            return AddReqResult.NO_TOKEN
        # radix match at admission (reference `handle_generate_request` does
        # the match; the adder consumes it)
        # mm requests key on cache_ids (content-hash surrogates at image
        # positions), so identical image contexts radix-share
        match = self.radix_cache.match_prefix(req.cache_ids)
        prefix_len = match.length
        # never cache-match the *entire* input: the last token must be
        # computed to produce the first logits (reference does the same trim)
        if prefix_len >= len(req.fill_ids):
            prefix_len = round_down(len(req.fill_ids) - 1, self.page_size)
        input_len = len(req.fill_ids) - prefix_len
        new_pages = cdiv(len(req.fill_ids), self.page_size) - prefix_len // self.page_size
        total_need = new_pages * self.page_size + req_decode_reserve(
            req,
            self.new_token_ratio,
            self.decode_lookahead,
            self.page_size,
            base_len=len(req.fill_ids),
        )
        if total_need > self.rem_total_tokens:
            return AddReqResult.NO_TOKEN
        if input_len > self.rem_input_tokens and self.can_run_list:
            return AddReqResult.NO_TOKEN

        take = min(input_len, self.rem_chunk_tokens, self.rem_input_tokens)
        if take < input_len:
            take = round_down(take, self.page_size)
            if take <= 0:
                return AddReqResult.NO_TOKEN

        # commit: take refs on the matched prefix + record geometry.
        # DP-attention rank: pinned by the matched prefix's region (pages
        # never cross regions), else least-loaded region, else keep the
        # rank of pages the request already holds (chunked re-admission).
        alloc = self.radix_cache.allocator
        if getattr(alloc, "striped_default", False):
            # pool-sharded CP: every request stripes across all regions
            req.dp_rank = alloc.STRIPED
        elif getattr(alloc, "dp_size", 1) > 1:
            if prefix_len > 0:
                req.dp_rank = alloc.page_rank(match.pages[0])
            elif req.pages:
                req.dp_rank = alloc.page_rank(req.pages[0])
            else:
                req.dp_rank = alloc.least_loaded_rank()
        match.pages = match.pages[: prefix_len // self.page_size]
        match.length = prefix_len
        self.radix_cache.lock_and_ref(match)
        req.pages = list(match.pages)
        req.kv_len = prefix_len
        req.prefix_len = prefix_len
        req.last_node = match.node if prefix_len > 0 else None
        req.cached_tokens = prefix_len
        req._extend_len = take
        req.is_chunked = take < input_len
        self.can_run_list.append(req)
        self.rem_input_tokens -= take
        self.rem_chunk_tokens -= take
        self.rem_total_tokens -= total_need
        self.log_hit_tokens += prefix_len
        self.log_input_tokens += take
        if req.is_chunked:
            self.new_chunked_req = req
            return AddReqResult.OTHER
        return AddReqResult.CONTINUE
