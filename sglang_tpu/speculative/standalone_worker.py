"""STANDALONE speculative decoding: a separate small draft model.

Parity with reference `speculative/standalone_worker.py` (S4): the draft
model greedily proposes k tokens; the target verifies them in ONE ragged
TARGET_VERIFY forward (same accept rule as NGRAM — output is identical to
plain target greedy decoding).

Draft state design: the worker owns a second ModelRunner + page allocator.
Per request it tracks `confirmed` = number of target-committed tokens whose
draft KV is valid. Each round it (a) catch-up-extends the draft over newly
committed tokens (overwriting any stale drafted-token KV at those
positions), taking the first proposal from the extend's sampled argmax,
then (b) runs k-1 draft decode steps for the rest. No rollback is ever
needed — rejected positions are simply re-extended next round.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.mem_cache.allocator import PageAllocator
from sglang_tpu.model_executor.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.utils import cdiv, get_logger

logger = get_logger(__name__)


class _DraftState:
    __slots__ = ("pages", "confirmed")

    def __init__(self):
        self.pages: List[int] = []
        self.confirmed = 0


class StandaloneDraftWorker:
    def __init__(self, server_args, target_config: ModelConfig):
        import copy

        draft_args = copy.copy(server_args)
        draft_args.model_path = server_args.speculative_draft_model_path
        draft_args.quantization = None
        draft_args.lora_paths = None
        draft_cfg = ModelConfig.load(
            server_args.speculative_draft_model_path,
            dtype=server_args.dtype,
            context_length=target_config.context_length,
            kv_cache_dtype=server_args.kv_cache_dtype,
        )
        assert draft_cfg.vocab_size == target_config.vocab_size, (
            "draft model must share the target's vocabulary"
        )
        self.runner = ModelRunner(draft_args, draft_cfg)
        self.allocator = PageAllocator(self.runner.num_pages, self.runner.page_size)
        self.num_draft = min(server_args.speculative_num_draft_tokens, 7)
        self.page_size = self.runner.page_size
        self.states: Dict[str, _DraftState] = {}
        self._greedy = SamplingParams(temperature=0.0, ignore_eos=True)

    def drop(self, rid: str) -> None:
        st = self.states.pop(rid, None)
        if st is not None:
            self.allocator.free(st.pages)

    def _ensure_pages(self, st: _DraftState, tokens: int) -> bool:
        need = cdiv(tokens, self.page_size) - len(st.pages)
        if need > 0:
            pages = self.allocator.alloc(need)
            if pages is None:
                return False
            st.pages.extend(pages)
        return True

    def _slot(self, st: _DraftState, pos: int) -> int:
        return st.pages[pos // self.page_size] * self.page_size + pos % self.page_size

    def propose_batch(self, reqs) -> List[List[int]]:
        """Draft up to num_draft tokens per request. Empty list on any
        per-request resource trouble (that request just decodes normally)."""
        k = self.num_draft
        active = []
        max_rows = self.runner.extend_seq_bucket
        for r in reqs:
            if len(active) >= max_rows:
                break
            st = self.states.get(r.rid)
            if st is None:
                st = self.states[r.rid] = _DraftState()
            fill = r.fill_ids
            if not self._ensure_pages(st, len(fill) + k):
                continue
            active.append((r, st))
        if not active:
            return [[] for _ in reqs]

        # ---- (a) catch-up extend over newly committed tokens (chunked to
        # the prefill token budget) ----
        b = len(active)
        pmax = self.runner.max_pages_per_req
        page_table = np.zeros((b, pmax), dtype=np.int32)
        for i, (_, st) in enumerate(active):
            page_table[i, : len(st.pages)] = st.pages
        drafts: List[List[int]] = [[] for _ in range(b)]
        max_tokens = self.runner.prefill_token_buckets[-1]
        g0 = 0
        while g0 < b:
            input_ids: List[int] = []
            positions: List[int] = []
            out_loc: List[int] = []
            group = []
            tok_sum = 0
            while g0 < b and len(group) < self.runner.extend_seq_bucket:
                r, st = active[g0]
                fill = r.fill_ids
                start = min(st.confirmed, len(fill) - 1)
                n = len(fill) - start
                if group and tok_sum + n > max_tokens:
                    break
                group.append((g0, r, st, start))
                tok_sum += n
                g0 += 1
            gb = len(group)
            seq_lens = np.zeros(gb, dtype=np.int32)
            extend_lens = np.zeros(gb, dtype=np.int32)
            gpt = np.zeros((gb, pmax), dtype=np.int32)
            for j, (gi, r, st, start) in enumerate(group):
                fill = r.fill_ids
                toks = fill[start:]
                input_ids.extend(toks)
                positions.extend(range(start, len(fill)))
                out_loc.extend(self._slot(st, p) for p in range(start, len(fill)))
                seq_lens[j] = len(fill)
                extend_lens[j] = len(toks)
                gpt[j] = page_table[gi]
            sinfo = SamplingBatchInfo.from_reqs(
                [self._greedy] * gb, padded_bs=self.runner.extend_seq_bucket
            )
            next_ids, _ = self.runner.forward_extend(
                np.asarray(input_ids, dtype=np.int32),
                np.asarray(positions, dtype=np.int32),
                np.asarray(out_loc, dtype=np.int32),
                gpt,
                seq_lens,
                extend_lens,
                sinfo,
            )
            next_ids = np.asarray(next_ids)[:gb]
            for j, (gi, r, st, start) in enumerate(group):
                drafts[gi] = [int(next_ids[j])]
                st.confirmed = len(r.fill_ids)

        # ---- (b) k-1 draft decode steps ----
        sinfo_d = SamplingBatchInfo.from_reqs(
            [self._greedy] * b,
            padded_bs=_bucket(b, self.runner.decode_bs_buckets),
        )
        for step in range(k - 1):
            ids = np.asarray([drafts[i][-1] for i in range(b)], dtype=np.int32)
            pos = np.asarray(
                [st.confirmed + step for _, st in active], dtype=np.int32
            )
            loc = np.asarray(
                [self._slot(st, int(pos[i])) for i, (_, st) in enumerate(active)],
                dtype=np.int32,
            )
            out, _ = self.runner.forward_decode(
                ids, pos, loc, page_table, pos + 1, sinfo_d
            )
            out = np.asarray(out)[:b]
            for i in range(b):
                drafts[i].append(int(out[i]))

        # map back to the full request list
        by_rid = {r.rid: d for (r, _), d in zip(active, drafts)}
        return [by_rid.get(r.rid, []) for r in reqs]


def _bucket(n, buckets):
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]
