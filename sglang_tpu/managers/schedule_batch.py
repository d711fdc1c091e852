"""Request lifecycle and host-side batch state.

Parity with reference `srt/managers/schedule_batch.py` (`Req:578` lifecycle +
finish conditions `:1148-1244` + retraction reset `:1245`;
`ScheduleBatch:1381` with `prepare_for_extend:1694`, `prepare_for_decode:2286`,
`retract_decode:2171`, `filter_batch:2406`, `merge_batch:2487`).

TPU-native design: `ScheduleBatch` is pure host state (Python lists + numpy)
— the device only ever sees the bucketed arrays produced per step by the
ModelRunner. Page accounting is fused with the ref-counting `PageAllocator`:
a request owns exactly one allocator ref for every page in `req.pages`
(radix-matched pages were inc_ref'd at admission; fresh pages are born with
ref 1), so freeing a request is always `allocator.free(req.pages)` no matter
how the radix tree has evolved meanwhile.
"""

from __future__ import annotations

import enum
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sglang_tpu.managers.io_struct import FinishReason
from sglang_tpu.mem_cache.allocator import PageAllocator
from sglang_tpu.mem_cache.radix_cache import RadixCache, TreeNode
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.utils import cdiv, get_logger

logger = get_logger(__name__)

# Global default when a request carries no max_new_tokens and the model has
# no context bound (tests); reference uses sampling-params default 128.
CLIP_MAX_NEW_TOKENS_ESTIMATE = 4096


class ReqStatus(enum.IntEnum):
    WAITING = 0
    RUNNING = 1  # prefilled, decoding
    FINISHED = 2
    ABORTED = 3


class Req:
    """One generation request's full lifecycle state."""

    def __init__(
        self,
        rid: str,
        input_ids: List[int],
        sampling_params: SamplingParams,
        eos_token_ids: Sequence[int] = (),
        return_logprob: bool = False,
        top_logprobs_num: int = 0,
        stream: bool = False,
        arrival_time: Optional[float] = None,
        priority: int = 0,
        lora_id: int = -1,
        mm_embeds=None,
        mm_positions=None,
        mrope_positions=None,
        mrope_delta=None,
    ):
        self.rid = rid
        self.input_ids = list(input_ids)
        self.sampling_params = sampling_params
        self.eos_token_ids = set(eos_token_ids) | set(
            sampling_params.stop_token_ids or []
        )
        self.return_logprob = return_logprob
        self.top_logprobs_num = top_logprobs_num
        self.stream = stream
        self.arrival_time = arrival_time if arrival_time is not None else time.monotonic()
        self.priority = priority
        self.lora_id = lora_id
        # multimodal: radix keys use `cache_ids` (content-hash surrogate
        # ids at image positions), so identical image contexts share KV
        self.mm_embeds = mm_embeds
        self.mm_positions = mm_positions
        self.mrope_positions = mrope_positions  # [3, prompt_len] or None
        self.mrope_delta = mrope_delta  # int or None

        self.status = ReqStatus.WAITING
        self.output_ids: List[int] = []
        self.finished_reason: Optional[FinishReason] = None

        # --- KV state ---
        # pages this request holds an allocator ref on, in order
        self.pages: List[int] = []
        # DP-attention region owning this request's pages (0 when dp off)
        self.dp_rank = 0
        # tokens whose KV has been written (prompt prefix + decoded-1)
        self.kv_len = 0
        # radix-matched prefix length at (latest) admission
        self.prefix_len = 0
        # deepest matched tree node (for unlock on exit)
        self.last_node: Optional[TreeNode] = None

        # --- chunked prefill ---
        self.is_chunked = False

        # --- penalty state slot (stable device-side row index) ---
        self.slot: Optional[int] = None
        self._counts_inited = False

        # --- logprobs ---
        self.output_token_logprobs: List[float] = []
        self.output_top_logprobs: List = []
        self.input_token_logprobs: Optional[List[float]] = None

        # --- stats ---
        self.cached_tokens = 0
        self.retract_count = 0
        self.queue_time: Optional[float] = None
        self.prefill_finished_time: Optional[float] = None
        self.first_token_time: Optional[float] = None
        self.last_token_time: Optional[float] = None

        # grammar state (set by GrammarManager when constrained)
        self.grammar = None

        # spec decoding bookkeeping
        self.spec_accept_tokens = 0
        self.spec_steps = 0

    # ------------------------------------------------------------- derived

    @property
    def fill_ids(self) -> List[int]:
        """All tokens that must eventually be in KV (prompt + generated)."""
        return self.input_ids + self.output_ids

    @property
    def cache_ids(self) -> List[int]:
        """Radix-cache key: fill_ids with each multimodal placeholder
        replaced by a content-derived surrogate id, so identical images
        share KV and different images never collide (reference RadixKey
        extra_key, `srt/mem_cache/radix_cache.py:66`). Surrogates live in
        [2^30, 2^31) — disjoint from any real vocab id and still int32
        for the native tree."""
        if self.mm_embeds is None:
            return self.fill_ids
        if getattr(self, "_cache_ids_prompt", None) is None:
            import hashlib

            import numpy as _np

            ids = list(self.input_ids)
            emb = _np.ascontiguousarray(self.mm_embeds)
            pos = _np.asarray(self.mm_positions).reshape(-1)
            for i, p in enumerate(pos):
                h = hashlib.blake2b(
                    emb[i].tobytes(), digest_size=4
                ).digest()
                ids[int(p)] = (
                    int.from_bytes(h, "little") & 0x3FFFFFFF
                ) | 0x40000000
            self._cache_ids_prompt = ids
        return self._cache_ids_prompt + self.output_ids

    @property
    def seqlen(self) -> int:
        return len(self.input_ids) + len(self.output_ids)

    @property
    def extend_len(self) -> int:
        """Tokens this prefill round must compute (set by prepare_for_extend)."""
        return self._extend_len

    def finished(self) -> bool:
        return self.status in (ReqStatus.FINISHED, ReqStatus.ABORTED)

    def max_new_tokens(self) -> int:
        return self.sampling_params.max_new_tokens

    # ------------------------------------------------------------- finish

    def check_finished(self, stop_str_hit: Optional[str] = None) -> None:
        """Token-level finish conditions (reference `Req.check_finished`,
        `schedule_batch.py:1148`). Stop-string matching happens in the
        detokenizer and is reported via `stop_str_hit`."""
        if self.finished():
            return
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self.finished_reason = FinishReason("length")
            self.status = ReqStatus.FINISHED
            return
        if self.seqlen >= getattr(self, "max_context_len", 1 << 30):
            self.finished_reason = FinishReason("length", message="context length")
            self.status = ReqStatus.FINISHED
            return
        if len(self.output_ids) < sp.min_new_tokens:
            return
        if not sp.ignore_eos and self.output_ids:
            last = self.output_ids[-1]
            if last in self.eos_token_ids:
                self.finished_reason = FinishReason("stop", matched=last)
                self.status = ReqStatus.FINISHED
                return
        if stop_str_hit is not None:
            self.finished_reason = FinishReason("stop", matched=stop_str_hit)
            self.status = ReqStatus.FINISHED

    def abort(self, message: str = "aborted") -> None:
        if not self.finished():
            self.finished_reason = FinishReason("abort", message=message)
            self.status = ReqStatus.ABORTED

    # ------------------------------------------------------------- retract

    def reset_for_retract(self) -> None:
        """Back to the waiting queue after decode OOM (reference
        `Req.reset_for_retract`, `schedule_batch.py:1245`). Generated tokens
        are kept — they re-enter as part of the prompt on re-admission."""
        self.status = ReqStatus.WAITING
        self.pages = []
        self.kv_len = 0
        self.prefix_len = 0
        self.last_node = None
        self.is_chunked = False
        self._counts_inited = False  # counts rebuilt on re-prefill
        self.retract_count += 1

    def __repr__(self):
        return (
            f"Req({self.rid[:8]}, in={len(self.input_ids)}, "
            f"out={len(self.output_ids)}, kv={self.kv_len}, st={self.status.name})"
        )


class ScheduleBatch:
    """Host-side state for the set of requests running one forward step.

    Owns the page-allocation side effects; produces plain numpy arrays the
    ModelRunner buckets and ships to the device.
    """

    def __init__(
        self,
        reqs: List[Req],
        allocator: PageAllocator,
        radix_cache: RadixCache,
        max_pages_per_req: int,
    ):
        self.reqs = reqs
        self.allocator = allocator
        self.radix_cache = radix_cache
        self.page_size = allocator.page_size
        self.max_pages_per_req = max_pages_per_req

    # --------------------------------------------------------------- utils

    def is_empty(self) -> bool:
        return len(self.reqs) == 0

    def batch_size(self) -> int:
        return len(self.reqs)

    def _page_table(self) -> np.ndarray:
        pt = np.zeros((len(self.reqs), self.max_pages_per_req), dtype=np.int32)
        for i, r in enumerate(self.reqs):
            pt[i, : len(r.pages)] = r.pages
        return pt

    def _slot(self, req: Req, pos: int) -> int:
        """Flat KV slot for token position `pos` of `req`."""
        ps = self.page_size
        return req.pages[pos // ps] * ps + pos % ps

    # -------------------------------------------------------------- extend

    def alloc_for_extend(self, req: Req, extend_len: int) -> bool:
        """Ensure `req` holds pages covering kv_len + extend_len tokens.
        Returns False (allocating nothing) on pool exhaustion."""
        need_tokens = req.kv_len + extend_len
        have = len(req.pages)
        need = cdiv(need_tokens, self.page_size)
        if need > self.max_pages_per_req:
            return False
        if need > have:
            new = self.allocator.alloc(need - have, rank=req.dp_rank)
            if new is None:
                return False
            req.pages.extend(new)
        return True

    def prepare_for_extend(self) -> Dict[str, np.ndarray]:
        """Build the packed ragged extend arrays. Page allocation must have
        been done by the PrefillAdder (via `alloc_for_extend`)."""
        input_ids: List[int] = []
        positions: List[int] = []
        out_loc: List[int] = []
        seq_lens = np.zeros(len(self.reqs), dtype=np.int32)
        extend_lens = np.zeros(len(self.reqs), dtype=np.int32)
        for i, r in enumerate(self.reqs):
            fill = r.fill_ids
            start = r.kv_len
            end = start + r._extend_len
            toks = fill[start:end]
            input_ids.extend(toks)
            positions.extend(range(start, end))
            out_loc.extend(self._slot(r, p) for p in range(start, end))
            seq_lens[i] = end
            extend_lens[i] = len(toks)
        return dict(
            input_ids=np.asarray(input_ids, dtype=np.int32),
            positions=np.asarray(positions, dtype=np.int32),
            out_cache_loc=np.asarray(out_loc, dtype=np.int32),
            page_table=self._page_table(),
            seq_lens=seq_lens,
            extend_lens=extend_lens,
        )

    def commit_extend(self) -> None:
        """Advance kv_len after a successful extend forward."""
        for r in self.reqs:
            r.kv_len += r._extend_len

    # -------------------------------------------------------------- decode

    def decode_pages_needed(self) -> int:
        """Pages that must be allocated for the next decode step."""
        n = 0
        for r in self.reqs:
            if r.kv_len + 1 > len(r.pages) * self.page_size:
                n += 1
        return n

    def prepare_for_decode(
        self, with_input_ids: bool = True
    ) -> Optional[Dict[str, np.ndarray]]:
        """One new token per running request. Returns None when page
        allocation fails (caller must retract). `with_input_ids=False` is
        the overlap-schedule variant: the input tokens are still on device
        (previous step's `next_ids`), so only position/slot metadata — which
        depends on kv_len alone — is assembled host-side."""
        ps = self.page_size
        # allocate boundary-crossing pages first, all-or-nothing
        needs: List[Req] = [
            r for r in self.reqs if r.kv_len + 1 > len(r.pages) * ps
        ]
        if needs:
            # all-or-nothing across DP regions: group by each request's rank
            by_rank: Dict[int, List[Req]] = {}
            for r in needs:
                by_rank.setdefault(r.dp_rank, []).append(r)
            granted: List[Tuple[Req, int]] = []
            for rank, rs in by_rank.items():
                pages = self.allocator.alloc(len(rs), rank=rank)
                if pages is None:
                    for r, p in granted:
                        self.allocator.free([p])
                    return None
                granted.extend(zip(rs, pages))
            for r, p in granted:
                r.pages.append(p)
        b = len(self.reqs)
        input_ids = np.zeros(b, dtype=np.int32)
        positions = np.zeros(b, dtype=np.int32)
        out_loc = np.zeros(b, dtype=np.int32)
        seq_lens = np.zeros(b, dtype=np.int32)
        for i, r in enumerate(self.reqs):
            if with_input_ids:
                input_ids[i] = r.fill_ids[r.kv_len]  # last sampled token
            positions[i] = r.kv_len
            out_loc[i] = self._slot(r, r.kv_len)
            seq_lens[i] = r.kv_len + 1
        return dict(
            input_ids=input_ids,
            positions=positions,
            out_cache_loc=out_loc,
            page_table=self._page_table(),
            seq_lens=seq_lens,
        )

    def commit_decode(self) -> None:
        for r in self.reqs:
            r.kv_len += 1

    def prepare_for_decode_multi(
        self, k_steps: int, with_input_ids: bool = True,
        lookahead_tokens: int = 0,
    ) -> Optional[Dict[str, np.ndarray]]:
        """Metadata for a K-step fused decode chunk: pages are allocated to
        cover kv_len + k_steps (+ lookahead_tokens, for zero-upload chained
        chunks whose page table must stay valid) per request up front;
        per-step slot ids are derived on device from the page table."""
        ps = self.page_size
        need: List[Tuple[Req, int]] = []
        total = 0
        for r in self.reqs:
            # never allocate past the row's maximum possible generation:
            # kv can only ever reach prompt + max_new_tokens, so lookahead
            # pages beyond that are pure waste (they were measured to eat
            # other requests' admission reserves and trigger retraction —
            # a finishing row used to allocate up to k+lookahead tokens
            # past its end, and zombie rows kept them until chain break)
            end_cap = len(r.input_ids) + r.sampling_params.max_new_tokens
            cap = min(
                r.kv_len + k_steps + lookahead_tokens,
                end_cap,
                self.max_pages_per_req * ps,
            )
            # rows at/past end_cap allocate nothing (n <= 0): their extra
            # in-chunk steps write to the garbage page and are trimmed at
            # resolution, exactly like zombie rows
            n = cdiv(cap, ps) - len(r.pages)
            if n > 0:
                need.append((r, n))
                total += n
        if total:
            by_rank: Dict[int, List[Tuple[Req, int]]] = {}
            for r, n in need:
                by_rank.setdefault(r.dp_rank, []).append((r, n))
            granted: List[Tuple[Req, List[int]]] = []
            ok = True
            for rank, items in by_rank.items():
                want = sum(n for _, n in items)
                pages = self.allocator.alloc(want, rank=rank)
                if pages is None:
                    ok = False
                    break
                off = 0
                for r, n in items:
                    granted.append((r, pages[off : off + n]))
                    off += n
            if not ok:
                for _, pgs in granted:
                    self.allocator.free(pgs)
                return None
            for r, pgs in granted:
                r.pages.extend(pgs)
        b = len(self.reqs)
        input_ids = np.zeros(b, dtype=np.int32)
        base_seq_lens = np.zeros(b, dtype=np.int32)
        for i, r in enumerate(self.reqs):
            if with_input_ids:
                input_ids[i] = r.fill_ids[r.kv_len]
            base_seq_lens[i] = r.kv_len + 1
        return dict(
            input_ids=input_ids,
            base_seq_lens=base_seq_lens,
            page_table=self._page_table(),
        )

    def commit_decode_multi(self, k_steps: int) -> None:
        for r in self.reqs:
            r.kv_len += k_steps

    # ------------------------------------------------------------- retract

    def retract_decode(self, release_fn) -> List[Req]:
        """Evict the newest requests until the next decode step fits
        (reference `retract_decode`, `schedule_batch.py:2171`). `release_fn`
        performs the cache/unlock/free bookkeeping (scheduler owns it).
        Returns the retracted requests (to be re-queued)."""
        sorted_idx = sorted(
            range(len(self.reqs)),
            key=lambda i: (len(self.reqs[i].output_ids), -self.reqs[i].arrival_time),
        )
        retracted: List[Req] = []
        keep = list(self.reqs)
        # Need one free page per potentially-boundary-crossing req plus slack.
        while keep:
            needed = sum(
                1 for r in keep if r.kv_len + 1 > len(r.pages) * self.page_size
            )
            if self.allocator.available_pages() >= max(needed, 1):
                break
            victim_pos = sorted_idx.pop()  # newest (fewest decoded tokens last)
            victim = self.reqs[victim_pos]
            if victim not in keep:
                continue
            keep.remove(victim)
            release_fn(victim)
            victim.reset_for_retract()
            retracted.append(victim)
            if len(keep) == 0:
                break
        self.reqs = keep
        return retracted

    # --------------------------------------------------------- merge/filter

    def filter_finished(self) -> List[Req]:
        done = [r for r in self.reqs if r.finished()]
        self.reqs = [r for r in self.reqs if not r.finished()]
        return done

    def merge(self, other: "ScheduleBatch") -> None:
        self.reqs.extend(other.reqs)
