"""Continuous-batching scheduler.

Parity with reference `srt/managers/scheduler.py:332 Scheduler`
(`event_loop_normal:1586`, `get_next_batch_to_run:2534`,
`get_new_batch_prefill:2660`, `update_running_batch:2952`, `run_batch:3050`,
`process_batch_result:3224`) redesigned for a single-process TPU host:

- The scheduler is *pulled* (`step()`), not an event loop — the Engine (or
  the HTTP server's pump thread) drives it, which keeps the whole engine in
  one process per host (JAX is multi-controller; every host runs the same
  schedule, see SURVEY §7.6).
- Prefill-priority policy identical to the reference: each step runs either
  one extend (prefill/chunked-prefill) batch or one decode round.
- Page + radix bookkeeping uses the fused ref-counting protocol documented
  in `schedule_batch.py`.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

import numpy as np

from sglang_tpu.managers.detokenizer import IncrementalDecoder
from sglang_tpu.managers.io_struct import (
    FinishReason,
    ReqStrOutput,
    TokenizedGenerateReqInput,
)
from sglang_tpu.managers.schedule_batch import Req, ReqStatus, ScheduleBatch
from sglang_tpu.managers.schedule_policy import (
    AddReqResult,
    PrefillAdder,
    SchedulePolicy,
)
from sglang_tpu.mem_cache.allocator import PageAllocator
from sglang_tpu.model_executor.model_runner import ModelRunner
from sglang_tpu.sampling.sampling_batch_info import (
    MAX_STOP_TOKENS,
    SamplingBatchInfo,
)
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import get_logger, round_down

logger = get_logger(__name__)


class SchedulerStats:
    """Counters surfaced at /metrics (reference
    `observability/metrics_collector.py:186 SchedulerMetricsCollector`)."""

    def __init__(self):
        self.num_prefill_tokens = 0
        self.num_decode_tokens = 0
        self.num_cached_tokens = 0
        self.num_finished = 0
        self.num_retractions = 0
        self.num_prefill_steps = 0
        self.num_decode_steps = 0
        self.num_hicache_tokens = 0  # tokens reloaded from the host tier
        self.num_jump_forward_tokens = 0  # grammar-forced tokens injected
        # speculative decoding accept stats (reference exports accept
        # length/rate, `observability/metrics_collector.py:186`)
        self.num_spec_steps = 0  # verify rounds
        self.num_spec_accepted = 0  # tokens committed by verify rounds
        # decode row-efficiency decomposition (bench diagnostics):
        # bucket rows = compute cost proxy (the chip pads to the bucket);
        # chain rows = live + zombie rows at dispatch; live rows = batch
        # members (unfinished) at dispatch. kept tokens are exact
        # (num_decode_tokens). useful/bucket = end-to-end decode efficiency.
        self.decode_bucket_row_steps = 0
        self.decode_chain_row_steps = 0
        self.decode_live_row_steps = 0
        # prefill padding: real tokens are num_prefill_tokens; padded is
        # the compile-bucket token count actually dispatched
        self.prefill_padded_tokens = 0
        # per-stage wall time (reference per-stage time stats,
        # `observability/req_time_stats.py`): where the scheduler thread
        # spends its time, exported at /metrics and printed by bench traces
        from collections import defaultdict

        self.stage_time = defaultdict(float)
        self.stage_max = defaultdict(float)  # worst single occurrence

    def add_stage(self, name: str, dt: float) -> None:
        self.stage_time[name] += dt
        if dt > self.stage_max[name]:
            self.stage_max[name] = dt

    def cache_hit_rate(self) -> float:
        total = self.num_prefill_tokens + self.num_cached_tokens
        return self.num_cached_tokens / total if total else 0.0


class _StageTimer:
    """`with stats.timed("decode_dispatch"): ...` wall-clock accumulator."""

    __slots__ = ("stats", "name", "t0")

    def __init__(self, stats: SchedulerStats, name: str):
        self.stats = stats
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self.t0
        self.stats.stage_time[self.name] += dt
        if dt > self.stats.stage_max[self.name]:
            self.stats.stage_max[self.name] = dt
        return False


SchedulerStats.timed = lambda self, name: _StageTimer(self, name)


class Scheduler:
    def __init__(
        self,
        server_args: ServerArgs,
        model_runner: Optional[ModelRunner] = None,
        tokenizer=None,
    ):
        self.server_args = server_args
        self.tokenizer = tokenizer
        self.runner = model_runner or ModelRunner(server_args)
        self.page_size = server_args.page_size

        self.allocator = PageAllocator(
            self.runner.num_pages,
            self.page_size,
            dp_size=self.runner.dp_size,
        )
        from sglang_tpu.mem_cache.native_radix import create_radix_cache

        # hybrid linear-attention models: recurrent state cannot be
        # prefix-shared, so the radix cache is forced off (reference gates
        # mamba-hybrid prefix caching the same way)
        self.is_hybrid = self.runner.model_config.is_hybrid
        self.radix_cache = create_radix_cache(
            self.allocator,
            self.page_size,
            disable=server_args.disable_radix_cache or self.is_hybrid,
        )
        self.allocator.evict_callback = self.radix_cache.evict
        if (
            getattr(server_args, "attn_cp_size", 1) > 1
            and getattr(server_args, "attn_cp_mode", "") == "pool-sharded"
        ):
            # pool-sharded CP: every request's pages stripe across all
            # regions (admission sets dp_rank = STRIPED; the pool itself
            # is range-partitioned over the "data" mesh axis)
            self.allocator.striped_default = True
        self.kv_events = None
        if server_args.enable_kv_cache_events:
            from sglang_tpu.mem_cache.kv_events import KVEventPublisher

            self.kv_events = KVEventPublisher(server_args.kv_events_addr)
            self.radix_cache.events = self.kv_events
        self.hicache = None
        if (
            server_args.enable_hierarchical_cache
            and not server_args.disable_radix_cache
        ):
            from sglang_tpu.mem_cache.hicache import HiCacheController

            cap = (
                int(server_args.hicache_size * (1 << 30))
                if server_args.hicache_size > 0
                else 2
                * self.runner.kv_pool.bytes_per_page()
                * self.runner.num_pages
            )
            self.hicache = HiCacheController(
                self.runner,
                self.radix_cache,
                self.allocator,
                cap,
                disk_dir=server_args.hicache_storage_dir,
                disk_capacity_bytes=int(
                    server_args.hicache_storage_size * (1 << 30)
                ),
                async_io=server_args.hicache_async,
            )
        self.policy = SchedulePolicy(server_args.schedule_policy, self.radix_cache)
        # Adaptive decode-headroom (reference scheduler new_token_ratio):
        # starts conservative, decays while retraction-free, bumps on OOM.
        from sglang_tpu.managers.schedule_policy import INIT_NEW_TOKEN_RATIO

        self.new_token_ratio = INIT_NEW_TOKEN_RATIO
        from sglang_tpu.constrained import create_grammar_backend

        self.grammar_backend = create_grammar_backend(server_args, tokenizer)

        self.spec = None
        self.draft_worker = None
        if server_args.speculative_algorithm == "NGRAM":
            from sglang_tpu.speculative.ngram_worker import NgramProposer

            self.spec = NgramProposer(
                min_match=server_args.speculative_ngram_min_match,
                max_match=server_args.speculative_ngram_max_match,
                num_draft_tokens=min(server_args.speculative_num_draft_tokens, 7),
            )
        elif server_args.speculative_algorithm == "STANDALONE":
            from sglang_tpu.speculative.standalone_worker import (
                StandaloneDraftWorker,
            )

            self.draft_worker = StandaloneDraftWorker(
                server_args, self.runner.model_config
            )
            self.spec = self.draft_worker  # enables the spec decode round
        elif server_args.speculative_algorithm in ("EAGLE", "EAGLE3"):
            from sglang_tpu.speculative.eagle_worker import EagleWorker

            self.draft_worker = EagleWorker(
                server_args,
                self.runner,
                mode="eagle3"
                if server_args.speculative_algorithm == "EAGLE3"
                else "eagle",
            )
            self.spec = self.draft_worker
        elif server_args.speculative_algorithm == "DFLASH":
            from sglang_tpu.speculative.dflash_worker import DflashWorker

            self.draft_worker = DflashWorker(server_args, self.runner)
            self.spec = self.draft_worker
        elif server_args.speculative_algorithm in ("MTP", "NEXTN"):
            from sglang_tpu.speculative.eagle_worker import EagleWorker

            self.draft_worker = EagleWorker(
                server_args, self.runner, mode="mtp"
            )
            self.spec = self.draft_worker

        self.waiting_queue: List[Req] = []
        self.running_batch = ScheduleBatch(
            [], self.allocator, self.radix_cache, self.runner.max_pages_per_req
        )
        self.chunked_req: Optional[Req] = None
        self.max_running_requests = min(
            server_args.max_running_requests or 1 << 30,
            self.runner.decode_bs_buckets[-1],
        )
        self.max_extend_reqs = self.runner.extend_seq_bucket
        self.max_queued_requests = server_args.max_queued_requests
        self.max_context_len = self.runner.model_config.context_length

        self.reqs: Dict[str, Req] = {}  # rid -> live req
        self.stats = SchedulerStats()
        from sglang_tpu.observability.metrics import RequestMetrics, SpanLog

        self.metrics = RequestMetrics()
        self.span_log = SpanLog(
            server_args.request_span_log,
            otlp_endpoint=server_args.otlp_traces_endpoint,
        )
        self._step_i = 0

        # overlap schedule state (reference `event_loop_overlap` +
        # FutureMap): one decode step kept in flight; its sampled tokens
        # stay on device and feed the next step's input_ids directly.
        self.enable_overlap = server_args.enable_overlap_schedule
        self._inflight = None  # (reqs_snapshot, next_ids_dev, tok_lp_dev)
        # device decode-chain rows (INCLUDING finished "zombie" rows): the
        # zero-upload chained dispatch stays valid across request finishes
        # because finished rows keep decoding into their own lookahead
        # pages (outputs discarded) until the chain breaks. Their page/slot
        # release is deferred to the break (reference zero-overhead
        # `event_loop_overlap` analogue: never stall the device on
        # per-request bookkeeping).
        self._chain_rows: Optional[List[Req]] = None
        self._chain_bb = 0  # compile bucket of the active chain (stats)
        self._deferred: List[Req] = []

        # penalty-state slots: stable device-side row per live request
        # adaptive speculative draft length (reference
        # speculative/adaptive_spec_params.py): EMA of accepted tokens per
        # verify round shrinks/grows the next round's draft budget
        self._spec_accept_ema: float = float(
            server_args.speculative_num_draft_tokens
        )
        self.max_slots = self.runner.slots_budget()
        self._slot_pool: List[int] = list(range(self.max_slots - 1, -1, -1))
        self.runner.set_max_slots(self.max_slots)

    # ----------------------------------------------------------- admission

    def add_request(self, treq: TokenizedGenerateReqInput) -> Req:
        if (
            self.max_queued_requests is not None
            and len(self.waiting_queue) >= self.max_queued_requests
        ):
            raise RuntimeError("request queue is full")
        if len(treq.input_ids) >= self.max_context_len:
            raise ValueError(
                f"prompt ({len(treq.input_ids)} tokens) exceeds context length "
                f"{self.max_context_len}"
            )
        lora_id = -1
        if treq.lora_path is not None:
            lm = self.runner.lora_manager
            if lm is None:
                raise ValueError("lora_path given but no adapters are loaded")
            lora_id = lm.acquire(treq.lora_path)
        req = Req(
            rid=treq.rid,
            input_ids=treq.input_ids,
            sampling_params=treq.sampling_params,
            eos_token_ids=self.runner.model_config.eos_token_ids,
            return_logprob=treq.return_logprob,
            top_logprobs_num=treq.top_logprobs_num,
            stream=treq.stream,
            arrival_time=treq.arrival_time or time.monotonic(),
            priority=treq.priority,
            lora_id=lora_id,
            mm_embeds=treq.mm_embeds,
            mm_positions=treq.mm_positions,
            mrope_positions=treq.mrope_positions,
            mrope_delta=treq.mrope_delta,
        )
        req.max_context_len = self.max_context_len
        # clamp generation to the KV context budget
        sp = req.sampling_params
        sp.max_new_tokens = min(
            sp.max_new_tokens, self.max_context_len - len(req.input_ids)
        )
        req.detok = IncrementalDecoder(
            self.tokenizer,
            skip_special_tokens=sp.skip_special_tokens,
            spaces_between_special_tokens=sp.spaces_between_special_tokens,
        )
        if sp.needs_grammar:
            if self.grammar_backend is None:
                raise ValueError(
                    "structured output requested but no grammar backend"
                )
            if sp.regex is not None:
                req.grammar = self.grammar_backend.get("regex", sp.regex)
            elif sp.json_schema is not None:
                req.grammar = self.grammar_backend.get("json_schema", sp.json_schema)
            elif sp.ebnf is not None:
                req.grammar = self.grammar_backend.get("ebnf", sp.ebnf)
            else:
                req.grammar = self.grammar_backend.get(
                    "structural_tag", sp.structural_tag
                )
        if sp.custom_logit_processor is not None:
            if sp.custom_logit_processor not in self.runner.custom_proc_index:
                raise ValueError(
                    f"unknown custom_logit_processor "
                    f"{sp.custom_logit_processor!r}; registered: "
                    f"{sorted(self.runner.custom_proc_index)}"
                )
        self.waiting_queue.append(req)
        self.reqs[req.rid] = req
        return req

    def abort_request(self, rid: str) -> bool:
        req = self.reqs.get(rid)
        if req is None:
            return False
        if req.status == ReqStatus.WAITING:
            if req is self.chunked_req:
                # mid-chunked-prefill: removed from the waiting queue at
                # admission but still WAITING, holding allocated pages
                self.chunked_req = None
                req.abort()
                self._release_req(req, insert=True)
                self.reqs.pop(rid, None)
            else:
                if req in self.waiting_queue:
                    self.waiting_queue.remove(req)
                req.abort()
                self.reqs.pop(rid, None)
        else:
            req.abort()  # released + emitted at the next step boundary
        return True

    # ----------------------------------------------------------- main step

    def has_work(self) -> bool:
        return bool(
            self.waiting_queue
            or self.running_batch.reqs
            or self.chunked_req
            or self._inflight is not None
        )

    def step(self) -> List[ReqStrOutput]:
        """Run one scheduling iteration. Returns incremental outputs."""
        self._step_i += 1
        if self.hicache is not None:
            # drain async tier-IO completions: finished spills commit to
            # the host store, finished loads publish to the device tree
            # (visible to this step's admission)
            self.stats.num_hicache_tokens += self.hicache.poll()
        pre_outputs: List[ReqStrOutput] = []
        if self.server_args.waiting_queue_timeout > 0 and self.waiting_queue:
            pre_outputs += self._abort_stale_waiting()
        if self.server_args.enable_priority_preemption:
            pre_outputs += self._maybe_preempt()
        with self.stats.timed("prefill_sched"):
            batch = self._get_new_batch_prefill()
        if batch is not None:
            # prefill changes the running batch: resolve any in-flight
            # decode first so batch state is exact
            with self.stats.timed("decode_resolve"):
                outputs = self._resolve_inflight()
            return pre_outputs + outputs + self._forward_extend(batch)
        if self.running_batch.reqs:
            return pre_outputs + self._forward_decode()
        with self.stats.timed("decode_resolve"):
            return pre_outputs + self._resolve_inflight()

    def _abort_stale_waiting(self) -> List[ReqStrOutput]:
        """Abort requests queued longer than `waiting_queue_timeout` s
        (reference request-age aborts, `srt/managers/scheduler.py:1537`)."""
        now = time.monotonic()
        limit = self.server_args.waiting_queue_timeout
        outputs: List[ReqStrOutput] = []
        for r in list(self.waiting_queue):
            if now - r.arrival_time > limit:
                self.waiting_queue.remove(r)
                r.abort(
                    f"aborted: queued longer than waiting_queue_timeout "
                    f"({limit:.1f}s)"
                )
                outputs.append(self._finish_req(r))
                logger.warning("aborted stale waiting request %s", r.rid)
        return outputs

    def _maybe_preempt(self) -> List[ReqStrOutput]:
        """Priority preemption: when the best waiting request has strictly
        higher priority than the lowest-priority running request and
        admission is blocked (pages or slots), retract lower-priority
        running requests to make room (reference
        `srt/managers/schedule_policy.py:1008 preempt_to_schedule`)."""
        if (
            self.server_args.schedule_policy != "priority"
            or not self.waiting_queue
            or not self.running_batch.reqs
        ):
            return []
        top = min(
            self.waiting_queue, key=lambda r: (-r.priority, r.arrival_time)
        )
        from sglang_tpu.managers.schedule_policy import (
            req_decode_reserve,
            total_decode_reserve,
        )

        ps = self.page_size
        # full remaining input, not the chunk cap: the adder's total_need
        # counts every new page even on chunked admission, and mismatching
        # it here retracts victims without ever unblocking `top`
        need_pages = -(-(len(top.fill_ids) - top.kv_len) // ps)
        slots_blocked = (
            len(self.running_batch.reqs) >= self.max_running_requests
        )
        # mirror the adder's reserve-aware admission test: blocked means
        # the adder would refuse `top` this round (including the
        # conservativeness multiplier the adder applies to its reserve)
        lookahead = self.server_args.decode_multi_step
        conserv = self.server_args.schedule_conservativeness
        need_tokens = need_pages * ps + req_decode_reserve(
            top, self.new_token_ratio, lookahead, ps,
            base_len=len(top.fill_ids),
        )
        headroom = (
            self.allocator.available_tokens()
            + self.radix_cache.evictable_pages * ps
            - total_decode_reserve(
                self.running_batch.reqs, self.new_token_ratio, lookahead, ps
            )
            * conserv
        )
        pages_blocked = headroom < need_tokens
        if not (slots_blocked or pages_blocked):
            return []
        # lowest priority first; among equals, newest (least progress) first
        victims = sorted(
            (
                r
                for r in self.running_batch.reqs
                if r.priority < top.priority
            ),
            key=lambda r: (r.priority, -r.arrival_time),
        )
        if not victims:
            return []
        # retraction invalidates the in-flight decode chain state
        with self.stats.timed("decode_resolve"):
            outputs = self._resolve_inflight()
        self._break_chain()
        for v in victims:
            headroom = (
                self.allocator.available_tokens()
                + self.radix_cache.evictable_pages * ps
                - total_decode_reserve(
                    self.running_batch.reqs, self.new_token_ratio, lookahead,
                    ps,
                )
                * conserv
            )
            if (
                headroom >= need_tokens
                and len(self.running_batch.reqs) < self.max_running_requests
            ):
                break
            if v not in self.running_batch.reqs:
                continue  # finished during resolve
            self.running_batch.reqs.remove(v)
            self._release_req(v, insert=False)
            v.reset_for_retract()
            self.waiting_queue.insert(0, v)
            self.stats.num_retractions += 1
            logger.info(
                "preempted %s (prio %d) for waiting %s (prio %d)",
                v.rid,
                v.priority,
                top.rid,
                top.priority,
            )
        return outputs

    # ------------------------------------------------------------- prefill

    def _get_new_batch_prefill(self) -> Optional[ScheduleBatch]:
        if not self.waiting_queue and self.chunked_req is None:
            return None
        running = len(self.running_batch.reqs)
        if self.chunked_req is None and running >= self.max_running_requests:
            return None

        if self.hicache is not None:
            # pull host-tier prefix hits into the device tree (sync mode)
            # or submit worker loads (async mode; completions drain at the
            # top of step())
            headroom = self.page_size * (running + 1)
            for r in self.waiting_queue[:8]:
                loaded = self.hicache.prefetch(r.cache_ids, headroom)
                if loaded:
                    self.stats.num_hicache_tokens += loaded

        # with mixed chunk active, reserve row-space in the token bucket so
        # appended decode rows never spill the batch into the next bucket
        mix_reserve = (
            self.runner.extend_seq_bucket
            if (
                self.server_args.enable_mixed_chunk
                and self.running_batch.reqs
                and self.spec is None
            )
            else 0
        )
        adder = PrefillAdder(
            self.allocator,
            self.radix_cache,
            self.running_batch.reqs,
            max_prefill_tokens=self.server_args.max_prefill_tokens,
            chunked_prefill_size=self.server_args.chunked_prefill_size,
            max_batch_tokens=self.runner.prefill_token_buckets[-1] - mix_reserve,
            conservativeness=self.server_args.schedule_conservativeness,
            page_size=self.page_size,
            new_token_ratio=self.new_token_ratio,
            decode_lookahead=self.server_args.decode_multi_step,
        )
        from sglang_tpu.managers.schedule_policy import (
            MIN_NEW_TOKEN_RATIO,
            NEW_TOKEN_RATIO_DECAY,
        )

        self.new_token_ratio = max(
            MIN_NEW_TOKEN_RATIO, self.new_token_ratio - NEW_TOKEN_RATIO_DECAY
        )
        if (
            self.server_args.prefill_accumulate_tokens
            # only delay prefill while decode has a healthy batch to chew
            # on — during ramp-up/drain, eager admission wins (decode at
            # bs 20 wastes far more than a padded prefill round)
            and len(self.running_batch.reqs) >= 64
            and self.chunked_req is None
            and self.waiting_queue
            and adder.rem_total_tokens
            < self.server_args.prefill_accumulate_tokens
        ):
            # headroom-accumulation: decode keeps the chip busy while
            # enough pool frees to fill a whole prefill bucket, instead of
            # paying a padded round for a sliver of admissions
            return None
        if self.chunked_req is not None:
            still_chunked = adder.add_chunked_req(self.chunked_req)
            if not still_chunked:
                self.chunked_req = None
        if adder.rem_input_tokens > 0 and adder.rem_chunk_tokens > 0:
            self.policy.calc_priority(self.waiting_queue)
            headroom = self.max_running_requests - running
            n_new = 0
            for req in list(self.waiting_queue):
                if n_new >= headroom or len(adder.can_run_list) >= self.max_extend_reqs:
                    break
                if (
                    self.hicache is not None
                    and self.hicache.pending_load_for(req.cache_ids)
                ):
                    # a host-tier load for this prefix is in flight: hold
                    # the request one round so admission realizes the hit
                    # instead of recomputing it (the worker always posts a
                    # completion, so the hold is bounded)
                    continue
                res = adder.add_one_req(req)
                if res == AddReqResult.NO_TOKEN:
                    break
                n_new += 1
                if res == AddReqResult.OTHER:  # became the new chunked req
                    break
        if not adder.can_run_list:
            return None

        admitted = [r for r in adder.can_run_list if r is not self.chunked_req]
        for r in admitted:
            if r in self.waiting_queue:
                self.waiting_queue.remove(r)
        if adder.new_chunked_req is not None:
            self.chunked_req = adder.new_chunked_req

        batch = ScheduleBatch(
            adder.can_run_list,
            self.allocator,
            self.radix_cache,
            self.runner.max_pages_per_req,
        )
        # page allocation (evict hook pulls from the radix LRU when short)
        ok_reqs = []
        for r in batch.reqs:
            if batch.alloc_for_extend(r, r._extend_len):
                ok_reqs.append(r)
            else:
                # pool exhausted despite budgets (locked pages): bounce back
                self._release_req(r, insert=False)
                r.reset_for_retract()
                self.waiting_queue.insert(0, r)
                if r is self.chunked_req:
                    self.chunked_req = None
        batch.reqs = ok_reqs
        if not batch.reqs:
            return None
        self.stats.num_cached_tokens += adder.log_hit_tokens
        return batch

    def _make_sinfo(
        self,
        reqs: List[Req],
        padded_bs: int,
        count_sample: Optional[List[bool]] = None,
        fresh: Optional[List[bool]] = None,
    ) -> SamplingBatchInfo:
        eos_blocked = []
        for r in reqs:
            if len(r.output_ids) < r.sampling_params.min_new_tokens:
                ids = sorted(r.eos_token_ids)
                if len(ids) > MAX_STOP_TOKENS:
                    logger.warning(
                        "request %s has %d eos/stop token ids; only the "
                        "first %d are blocked for min_new_tokens",
                        r.rid, len(ids), MAX_STOP_TOKENS,
                    )
                eos_blocked.append(ids[:MAX_STOP_TOKENS])
            else:
                eos_blocked.append([])
        grammar_masks = None
        if any(r.grammar is not None for r in reqs):
            vocab = self.runner.model_config.vocab_size
            grammar_masks = np.ones((len(reqs), vocab), dtype=bool)
            for i, r in enumerate(reqs):
                if r.grammar is not None and not r.grammar.finished:
                    m = r.grammar.vocab_mask()
                    grammar_masks[i, : len(m)] = m[:vocab]
                    if len(m) < vocab:
                        grammar_masks[i, len(m):] = False
        custom_proc_ids = None
        if any(
            r.sampling_params.custom_logit_processor is not None for r in reqs
        ):
            idx = self.runner.custom_proc_index
            custom_proc_ids = [
                idx.get(r.sampling_params.custom_logit_processor, -1)
                if r.sampling_params.custom_logit_processor is not None
                else -1
                for r in reqs
            ]
        return SamplingBatchInfo.meta_from_reqs(
            [r.sampling_params for r in reqs],
            padded_bs=padded_bs,
            slots=[r.slot if r.slot is not None else self.max_slots for r in reqs],
            fresh=fresh,
            count_sample=count_sample,
            eos_blocked=eos_blocked,
            max_slots=self.max_slots,
            grammar_masks=grammar_masks,
            custom_proc_ids=custom_proc_ids,
        )

    def _forward_extend(self, batch: ScheduleBatch) -> List[ReqStrOutput]:
        # prefill changes batch membership and device KV: chain is over
        self._break_chain()
        _t_prep0 = time.perf_counter()
        for r in batch.reqs:
            if r.slot is None and self._slot_pool:
                r.slot = self._slot_pool.pop()
        # mixed chunk (reference --enable-mixed-chunk): running requests
        # ride the prefill forward as 1-token decode rows so decode keeps
        # progressing through long prefill phases. Their input token was
        # already penalty-counted at sample time, so the row is marked
        # prompt-kind (output_start sentinel) — only the NEW sample counts.
        mixed: List[Req] = []
        if (
            self.server_args.enable_mixed_chunk
            and self.running_batch.reqs
            and self.spec is None
        ):
            from sglang_tpu.utils import pad_to_bucket as _ptb

            prefill_tokens = sum(r._extend_len for r in batch.reqs)
            # stay within the bucket the prefill tokens already land in
            budget_tokens = (
                _ptb(prefill_tokens, self.runner.prefill_token_buckets)
                - prefill_tokens
            )
            for r in self.running_batch.reqs:
                if (
                    len(batch.reqs) + len(mixed) >= self.max_extend_reqs
                    or len(mixed) >= budget_tokens
                ):
                    break
                if r in batch.reqs or r.finished():
                    continue
                if not self.running_batch.alloc_for_extend(r, 1):
                    break
                r._extend_len = 1
                mixed.append(r)
        all_reqs = batch.reqs + mixed
        exec_batch = (
            batch
            if not mixed
            else ScheduleBatch(
                all_reqs,
                self.allocator,
                self.radix_cache,
                self.runner.max_pages_per_req,
            )
        )
        arrays = exec_batch.prepare_for_extend()
        meta = self._make_sinfo(
            all_reqs,
            padded_bs=self.runner.extend_seq_bucket,
            count_sample=[not r.is_chunked for r in batch.reqs]
            + [True] * len(mixed),
            fresh=[not r._counts_inited for r in batch.reqs]
            + [False] * len(mixed),
        )
        output_start = np.asarray(
            [len(r.input_ids) for r in batch.reqs] + [1 << 30] * len(mixed),
            dtype=np.int32,
        )
        lora_active = self._lora_batch(all_reqs)
        mm_rows, mm_embeds = self._mm_chunk_arrays(all_reqs)
        mrope_pos = self._mrope_chunk_arrays(all_reqs)
        _t_run0 = time.perf_counter()
        self.stats.add_stage("prefill_prep", _t_run0 - _t_prep0)
        if (
            not meta.flags[5]
            and not lora_active
            and mm_rows is None
            and mrope_pos is None
        ):  # single-blob upload path
            next_ids, tok_lp = self.runner.forward_extend_packed(
                arrays["input_ids"],
                arrays["positions"],
                arrays["out_cache_loc"],
                arrays["page_table"],
                arrays["seq_lens"],
                arrays["extend_lens"],
                meta,
                output_start=output_start,
            )
        else:
            seq_lora = self._lora_ids_per_seq(all_reqs)
            tok_lora = (
                np.repeat(seq_lora, arrays["extend_lens"])
                if seq_lora is not None
                else None
            )
            next_ids, tok_lp = self.runner.forward_extend(
                arrays["input_ids"],
                arrays["positions"],
                arrays["out_cache_loc"],
                arrays["page_table"],
                arrays["seq_lens"],
                arrays["extend_lens"],
                meta.to_sinfo(),
                output_start=output_start,
                lora_ids=tok_lora,
                mm_rows=mm_rows,
                mm_embeds=mm_embeds,
                mrope_positions=mrope_pos,
            )
        for r in batch.reqs:
            r._counts_inited = True
        next_ids = np.asarray(next_ids)
        tok_lp = np.asarray(tok_lp)
        _t_post0 = time.perf_counter()
        self.stats.add_stage("prefill_run", _t_post0 - _t_run0)
        exec_batch.commit_extend()
        self.stats.num_prefill_tokens += int(
            arrays["extend_lens"][: len(batch.reqs)].sum()
        )
        self.stats.num_prefill_steps += 1
        from sglang_tpu.utils import pad_to_bucket as _ptb2

        self.stats.prefill_padded_tokens += _ptb2(
            int(arrays["extend_lens"].sum()), self.runner.prefill_token_buckets
        )

        outputs: List[ReqStrOutput] = []
        to_run: List[Req] = []
        now = time.monotonic()
        for i, r in enumerate(batch.reqs):
            if r.is_chunked:
                continue  # mid-prompt logits are meaningless; keep prefilling
            r.status = ReqStatus.RUNNING
            r.prefill_finished_time = now
            self._append_token(r, int(next_ids[i]), float(tok_lp[i]))
            # publish the finished prefix so concurrent requests share it
            self._cache_unfinished(r)
            if r.finished():
                outputs.append(self._finish_req(r))
            else:
                to_run.append(r)
                if r.stream:
                    out = self._emit_stream(r)
                    if out:
                        outputs.append(out)
        self.running_batch.reqs.extend(to_run)
        # resolve the mixed decode rows (same handling as a decode step)
        for j, r in enumerate(mixed):
            i = len(batch.reqs) + j
            if r.finished():
                continue
            self._append_token(r, int(next_ids[i]), float(tok_lp[i]))
            self.stats.num_decode_tokens += 1
            if r.finished():
                outputs.append(self._finish_req(r))
            elif r.stream and len(r.output_ids) % self.server_args.stream_interval == 0:
                out = self._emit_stream(r)
                if out:
                    outputs.append(out)
        if mixed:
            self.running_batch.filter_finished()
        self.stats.add_stage("prefill_post", time.perf_counter() - _t_post0)
        return outputs

    # -------------------------------------------------------------- decode

    def _spec_eligible(self) -> bool:
        """Greedy self-speculation is output-identical only when every
        request is greedy with no penalties/grammar/logprobs."""
        if self.spec is None:
            return False
        if self.runner.dp_size > 1 or self.is_hybrid:
            # draft pools are not DP-region-partitioned / state-aware yet
            return False
        for r in self.running_batch.reqs:
            sp = r.sampling_params
            if (
                not sp.is_greedy
                or r.grammar is not None
                or r.return_logprob
                or sp.frequency_penalty != 0.0
                or sp.presence_penalty != 0.0
                or sp.repetition_penalty != 1.0
                or sp.min_new_tokens > len(r.output_ids)
                # the verify forwards take no lora_ids / mrope / mm inputs,
                # so speculation would silently run the base model instead
                or getattr(r, "lora_id", -1) >= 0
                or r.mrope_positions is not None
                or r.mm_embeds is not None
            ):
                return False
        return True

    def _spec_k(self) -> int:
        """Draft length for the next verify round: EMA(accepted)+1, capped
        by the configured maximum — short drafts when acceptance is poor
        keep the verify rows (and wasted KV writes) proportional to the
        realized speedup (reference adaptive_spec_params.py)."""
        return max(1, min(self.spec.num_draft, int(self._spec_accept_ema) + 1))

    def _spec_observe_accept(self, n: int) -> None:
        self._spec_accept_ema = 0.8 * self._spec_accept_ema + 0.2 * n

    def _forward_spec_decode_tree(self) -> List[ReqStrOutput]:
        """Tree speculation (EAGLE-2-lite): the draft proposes tree_width
        root-branched candidate paths per request; ALL paths verify in one
        ragged TARGET_VERIFY forward as independent rows sharing the
        request's prefix pages (non-canonical paths write their KV to
        scratch pages, with the shared boundary page copied in). The best
        -accepting path commits; if it was not path 0, its accepted
        tokens' KV re-extends into the real pages."""
        from sglang_tpu.speculative.ngram_worker import accept_draft_greedy

        batch = self.running_batch
        ps = self.page_size
        reqs = batch.reqs
        tk = self.server_args.speculative_eagle_topk
        trees = self.draft_worker.propose_tree(reqs, tk)
        capped: List[List[List[int]]] = []
        for r, paths in zip(reqs, trees):
            k_cap = min(
                self._spec_k(),
                self.max_context_len - r.seqlen - 1,
                r.sampling_params.max_new_tokens - len(r.output_ids) - 1,
            )
            cut = [p[: k_cap] for p in paths] if k_cap > 0 else []
            seen, uniq = set(), []
            for p_ in cut:
                if p_ and tuple(p_) not in seen:
                    seen.add(tuple(p_))
                    uniq.append(p_)
            capped.append(uniq)
        # canonical (path 0) KV lands in the request's real pages
        for r, paths in zip(reqs, capped):
            while True:
                need = 1 + (len(paths[0]) if paths else 0)
                if batch.alloc_for_extend(r, need):
                    break
                if not paths:
                    return self._forward_decode_normal()
                paths.clear()
        input_ids: List[int] = []
        positions: List[int] = []
        out_loc: List[int] = []
        pt_rows: List[np.ndarray] = []
        seq_l: List[int] = []
        ext_l: List[int] = []
        row_info: List[tuple] = []  # (req_index, path or None, row_start)
        scratch: List[int] = []
        copy_pairs: List[tuple] = []
        pmax = self.runner.max_pages_per_req
        tok_off = 0
        row_budget = self.runner.extend_seq_bucket
        for i, (r, paths) in enumerate(zip(reqs, capped)):
            pend = r.fill_ids[r.kv_len]
            base_pt = np.zeros(pmax, dtype=np.int32)
            base_pt[: len(r.pages)] = r.pages
            plist = paths if paths else [[]]
            # every remaining request needs at least one verify row
            room = row_budget - len(pt_rows) - (len(reqs) - 1 - i)
            plist = plist[: max(1, room)]
            for pi, path in enumerate(plist):
                toks = [pend] + path
                lo = r.kv_len
                hi = lo + len(toks) - 1
                if pi == 0:
                    pt = base_pt
                    slots = [batch._slot(r, p) for p in range(lo, hi + 1)]
                else:
                    i0, i1 = lo // ps, hi // ps
                    pg = self.allocator.alloc(i1 - i0 + 1, rank=r.dp_rank)
                    if pg is None:
                        continue  # drop this path under page pressure
                    scratch.extend(pg)
                    pt = base_pt.copy()
                    pt[i0 : i1 + 1] = pg
                    if lo % ps:
                        copy_pairs.append((int(base_pt[i0]), pg[0], lo % ps))
                    slots = [
                        pg[(p // ps) - i0] * ps + p % ps
                        for p in range(lo, hi + 1)
                    ]
                input_ids.extend(toks)
                positions.extend(range(lo, hi + 1))
                out_loc.extend(slots)
                pt_rows.append(pt)
                seq_l.append(hi + 1)
                ext_l.append(len(toks))
                row_info.append((i, path if paths else None, tok_off, pi))
                tok_off += len(toks)
        self.runner.copy_partial_pages(copy_pairs)
        ids = self.runner.forward_verify(
            np.asarray(input_ids, dtype=np.int32),
            np.asarray(positions, dtype=np.int32),
            np.asarray(out_loc, dtype=np.int32),
            np.stack(pt_rows),
            np.asarray(seq_l, dtype=np.int32),
            np.asarray(ext_l, dtype=np.int32),
            num_draft=self.spec.num_draft,
            need_hidden=hasattr(self.draft_worker, "observe_features"),
        )
        verify_hidden = getattr(self.runner, "_last_verify_hidden", None)
        feed_feats = hasattr(self.draft_worker, "observe_features")
        # best-accepting path per request
        best: dict = {}
        for (i, path, off, pi) in row_info:
            d = path or []
            acc = accept_draft_greedy(ids[off : off + 1 + len(d)], d)
            if i not in best or len(acc) > len(best[i][0]):
                best[i] = (acc, off, pi, d)
        outputs: List[ReqStrOutput] = []
        reextend: List[tuple] = []
        for i, r in enumerate(reqs):
            acc, off, pi, d = best[i]
            budget = r.sampling_params.max_new_tokens - len(r.output_ids)
            acc = acc[: max(1, budget)]
            if feed_feats and verify_hidden is not None and len(acc):
                self.draft_worker.observe_features(
                    r.rid, r.kv_len, verify_hidden[off : off + len(acc)]
                )
            if pi != 0 and len(acc) > 1:
                # accepted draft KV lives on scratch: rewrite into real
                reextend.append((r, r.kv_len + 1, list(acc[:-1])))
            r.kv_len += len(acc)
            r.spec_steps += 1
            r.spec_accept_tokens += len(acc)
            self.stats.num_spec_steps += 1
            self.stats.num_spec_accepted += len(acc)
            self.stats.num_decode_tokens += len(acc)
            self._spec_observe_accept(len(acc))
            for tok in acc:
                self._append_token(r, int(tok), 0.0)
                if r.finished():
                    break
            if r.finished():
                outputs.append(self._finish_req(r))
            elif r.stream and len(r.output_ids) % self.server_args.stream_interval < len(acc):
                out = self._emit_stream(r)
                if out:
                    outputs.append(out)
        if scratch:
            self.allocator.free(scratch)
        if reextend:
            t_ids, t_pos, t_loc, t_pt = [], [], [], []
            t_seq, t_ext = [], []
            for r, start, toks in reextend:
                if r.pages == []:  # finished + released before re-extend
                    continue
                t_ids.extend(toks)
                t_pos.extend(range(start, start + len(toks)))
                t_loc.extend(batch._slot(r, p) for p in range(start, start + len(toks)))
                row = np.zeros(pmax, dtype=np.int32)
                row[: len(r.pages)] = r.pages
                t_pt.append(row)
                t_seq.append(start + len(toks))
                t_ext.append(len(toks))
            if t_ids:
                self.runner.forward_extend_hidden(
                    np.asarray(t_ids, dtype=np.int32),
                    np.asarray(t_pos, dtype=np.int32),
                    np.asarray(t_loc, dtype=np.int32),
                    np.stack(t_pt),
                    np.asarray(t_seq, dtype=np.int32),
                    np.asarray(t_ext, dtype=np.int32),
                )
        self.stats.num_decode_steps += 1
        batch.filter_finished()
        return outputs

    def _forward_spec_decode(self) -> List[ReqStrOutput]:
        """NGRAM speculative round: one ragged TARGET_VERIFY forward decodes
        up to 1+k tokens per request (reference
        `event_loop` spec path via EAGLEWorker/NgramWorker)."""
        batch = self.running_batch
        ps = self.page_size
        reqs = batch.reqs
        if self.draft_worker is not None:
            raw = self.draft_worker.propose_batch(reqs)
        else:
            raw = [self.spec.propose(r.fill_ids) for r in reqs]
        drafts: List[List[int]] = []
        for r, d in zip(reqs, raw):
            k_cap = min(
                self._spec_k(),
                self.max_context_len - r.seqlen - 1,
                r.sampling_params.max_new_tokens - len(r.output_ids) - 1,
            )
            drafts.append(d[: max(0, k_cap)] if k_cap > 0 else [])
        # page allocation for 1 + k tokens per req (draft dropped on pressure)
        for r, d in zip(reqs, drafts):
            while True:
                if batch.alloc_for_extend(r, 1 + len(d)):
                    break
                if not d:
                    # cannot even fit the mandatory decode token: fall back
                    # to the normal decode path (it owns retraction)
                    return self._forward_decode_normal()
                del d[:]  # drop the draft, retry with 1 token
        input_ids: List[int] = []
        positions: List[int] = []
        out_loc: List[int] = []
        b = len(reqs)
        seq_lens = np.zeros(b, dtype=np.int32)
        extend_lens = np.zeros(b, dtype=np.int32)
        for i, (r, d) in enumerate(zip(reqs, drafts)):
            toks = [r.fill_ids[r.kv_len]] + d
            input_ids.extend(toks)
            positions.extend(range(r.kv_len, r.kv_len + len(toks)))
            out_loc.extend(
                batch._slot(r, p) for p in range(r.kv_len, r.kv_len + len(toks))
            )
            seq_lens[i] = r.kv_len + len(toks)
            extend_lens[i] = len(toks)
        ids = self.runner.forward_verify(
            np.asarray(input_ids, dtype=np.int32),
            np.asarray(positions, dtype=np.int32),
            np.asarray(out_loc, dtype=np.int32),
            batch._page_table(),
            seq_lens,
            extend_lens,
            num_draft=self.spec.num_draft,
            need_hidden=self.draft_worker is not None
            and hasattr(self.draft_worker, "observe_features"),
        )
        from sglang_tpu.speculative.ngram_worker import accept_draft_greedy

        verify_hidden = getattr(self.runner, "_last_verify_hidden", None)
        feed_feats = self.draft_worker is not None and hasattr(
            self.draft_worker, "observe_features"
        )
        outputs: List[ReqStrOutput] = []
        off = 0
        for r, d in zip(reqs, drafts):
            t_ids = ids[off : off + 1 + len(d)]
            row0 = off
            off += 1 + len(d)
            acc = accept_draft_greedy(t_ids, d)
            # never overshoot the generation budget
            budget = r.sampling_params.max_new_tokens - len(r.output_ids)
            acc = acc[: max(1, budget)]
            if feed_feats and verify_hidden is not None and len(acc):
                # features of the positions committed this round (the
                # verify rows 0..len(acc)-1 of this request)
                self.draft_worker.observe_features(
                    r.rid, r.kv_len, verify_hidden[row0 : row0 + len(acc)]
                )
            r.kv_len += len(acc)
            r.spec_steps += 1
            r.spec_accept_tokens += len(acc)
            self.stats.num_spec_steps += 1
            self.stats.num_spec_accepted += len(acc)
            self.stats.num_decode_tokens += len(acc)
            self._spec_observe_accept(len(acc))
            for tok in acc:
                self._append_token(r, int(tok), 0.0)
                if r.finished():
                    break
            if r.finished():
                outputs.append(self._finish_req(r))
            elif r.stream and len(r.output_ids) % self.server_args.stream_interval < len(acc):
                out = self._emit_stream(r)
                if out:
                    outputs.append(out)
        self.stats.num_decode_steps += 1
        batch.filter_finished()
        return outputs

    def _forward_decode(self) -> List[ReqStrOutput]:
        if self._spec_eligible():
            outputs = self._resolve_inflight()  # spec needs resolved tokens
            self._break_chain()  # verify forwards invalidate the chain
            if (
                self.server_args.speculative_eagle_topk > 1
                and self.draft_worker is not None
                and hasattr(self.draft_worker, "propose_tree")
            ):
                return outputs + self._forward_spec_decode_tree()
            return outputs + self._forward_spec_decode()
        if (
            self.server_args.decode_multi_step > 1
            and self._no_grammar()
            and self._no_mrope()  # delta offsets need the per-row path
            and not self._lora_batch(self.running_batch.reqs)
        ):
            return self._forward_decode_multi()
        return self._forward_decode_normal()

    def _forward_decode_multi(self) -> List[ReqStrOutput]:
        """K fused decode steps per dispatch (reference multi-step decode /
        CUDA-graph replay chains): over-generates up to K-1 tokens past a
        stop, trimmed at resolution. Finished requests stay pinned as
        zombie rows until the chain breaks, so the zero-upload chained
        dispatch keeps flowing across finishes (on a tunneled runtime a
        fresh dispatch costs several RTTs; a chained one costs ~1 ms)."""
        batch = self.running_batch
        k = self.server_args.decode_multi_step
        latency_mode = any(r.stream for r in batch.reqs)
        if latency_mode:
            # latency-sensitive (streaming) traffic: cap the fused chunk.
            # TTFT floors at one chunk because admission cannot interrupt
            # a dispatched chain — online_chain_depth trades a little
            # dispatch amortization for a ~K*step admission-wait bound
            # (ONLINE_r04's 296 ms median TTFT @ 4 rps was chain-wait).
            k = max(
                2,
                min(
                    k,
                    self.server_args.stream_interval,
                    self.server_args.online_chain_depth,
                ),
            )
        # overlap pre-dispatches chunk N+1 before resolving N, which is
        # the throughput mode — but an arrival during the resolve then
        # waits through ALL of N+1 (~1.5 chunks measured: 168 ms median
        # arrival->prefill vs an 83 ms no-wait floor). Latency mode
        # resolves synchronously so the pump admits new requests after
        # every chunk.
        overlap_ok = self.enable_overlap and not latency_mode
        outputs: List[ReqStrOutput] = []
        rows = self._chain_rows
        # device rows (incl. zombies) still project onto the live batch?
        chain_valid = (
            rows is not None
            and [r for r in rows if not r.finished()] == batch.reqs
        )
        if chain_valid and self.runner.decode_chain_ready():
            # zero-upload dispatch: page table, sampling state, first ids,
            # base seq lens, and rng are all device-resident. The chain
            # replays the K it was compiled with (adaptive K only changes
            # at fresh dispatches).
            k = self.runner._chain["k"]
            _t_disp0 = time.perf_counter()
            all_ids, all_lp, last_ids = (
                self.runner.forward_decode_multi_chained()
            )
            batch.commit_decode_multi(k)
            self.stats.num_decode_steps += k
            self.stats.decode_bucket_row_steps += k * self._chain_bb
            self.stats.decode_chain_row_steps += k * len(rows)
            self.stats.decode_live_row_steps += k * len(batch.reqs)
            self.stats.add_stage(
                "decode_dispatch", time.perf_counter() - _t_disp0
            )
            prev = self._inflight
            inflight = (rows, all_ids, all_lp, last_ids)
            with self.stats.timed("decode_resolve"):
                if overlap_ok:
                    self._inflight = inflight
                    if prev is not None:
                        outputs += self._process_decode_result(prev)
                    return outputs
                outputs += self._process_decode_result(inflight)
            return outputs

        # horizon exhausted or membership changed: go fresh. The previous
        # chunk's device-resident last ids stay usable only when the row
        # set IS the live batch (no zombies -> row indices line up).
        chained_ids = (
            chain_valid
            and not self._deferred
            and rows == batch.reqs
            and self._inflight is not None
            and self._inflight[0] is rows
        )
        if self._inflight is not None and not chained_ids:
            with self.stats.timed("decode_resolve"):
                outputs += self._resolve_inflight()
            chained_ids = False
        if not chained_ids:
            self._break_chain()
        if not batch.reqs:
            return outputs
        _t_prep0 = time.perf_counter()
        # pre-allocate pages for several chunks ahead when the pool has
        # slack, so the following chunks dispatch with zero uploads
        horizon = 1
        avail = self.allocator.available_pages() * self.page_size
        chunk_need = k * len(batch.reqs)
        if avail > 16 * chunk_need:
            horizon = 8
        elif avail > 8 * chunk_need:
            horizon = 4
        elif avail > 4 * chunk_need:
            horizon = 2
        arrays = batch.prepare_for_decode_multi(
            k,
            with_input_ids=not chained_ids,
            lookahead_tokens=(horizon - 1) * k,
        )
        if arrays is None and horizon > 1:
            horizon = 1
            arrays = batch.prepare_for_decode_multi(
                k, with_input_ids=not chained_ids
            )
        if arrays is None:
            # K-token up-front allocation failed: the single-step path
            # makes progress with 1-token granularity (owns retraction)
            outputs += self._resolve_inflight()
            self._break_chain()
            if not batch.reqs:
                return outputs
            return outputs + self._forward_decode_normal()
        meta = self._make_sinfo(
            batch.reqs,
            padded_bs=_bucket(
                len(batch.reqs), self.runner.decode_bs_buckets
            ),
        )
        self._chain_bb = meta.padded_bs
        self.stats.decode_bucket_row_steps += k * meta.padded_bs
        self.stats.decode_chain_row_steps += k * len(batch.reqs)
        self.stats.decode_live_row_steps += k * len(batch.reqs)
        first_ids = self._inflight[3] if chained_ids else arrays["input_ids"]
        _t_disp0 = time.perf_counter()
        self.stats.add_stage("decode_prep", _t_disp0 - _t_prep0)
        all_ids, all_lp, last_ids = self.runner.forward_decode_multi(
            first_ids,
            arrays["base_seq_lens"],
            arrays["page_table"],
            meta,
            k,
            horizon=horizon,
        )
        batch.commit_decode_multi(k)
        self.stats.num_decode_steps += k
        self.stats.add_stage(
            "decode_dispatch", time.perf_counter() - _t_disp0
        )
        prev = self._inflight if chained_ids else None
        self._chain_rows = list(batch.reqs)
        inflight = (self._chain_rows, all_ids, all_lp, last_ids)
        with self.stats.timed("decode_resolve"):
            if overlap_ok:
                self._inflight = inflight
                if prev is not None:
                    outputs += self._process_decode_result(prev)
                return outputs
            outputs += self._process_decode_result(inflight)
        return outputs

    def _break_chain(self) -> None:
        """Invalidate the device decode chain and release zombie rows'
        deferred pages/slots (radix-inserting their finished prefixes)."""
        self.runner.invalidate_decode_chain()
        self._chain_rows = None
        if self._deferred:
            for r in self._deferred:
                self._release_req(r, insert=True)
            self._deferred.clear()

    def _lora_batch(self, reqs) -> bool:
        return any(r.lora_id >= 0 for r in reqs)

    def _lora_ids_per_seq(self, reqs):
        if not self._lora_batch(reqs):
            return None
        zero = self.runner.lora_manager.zero_slot
        return np.asarray(
            [r.lora_id if r.lora_id >= 0 else zero for r in reqs], dtype=np.int32
        )

    def _mrope_deltas(self, reqs):
        if not any(r.mrope_delta is not None for r in reqs):
            return None
        return np.asarray(
            [r.mrope_delta or 0 for r in reqs], dtype=np.int32
        )

    def _no_mrope(self) -> bool:
        return not any(
            r.mrope_delta is not None for r in self.running_batch.reqs
        )

    def _no_grammar(self) -> bool:
        """Grammar masks need the sampled token on host before the next
        step, so they force the synchronous single-step path (reference
        excludes grammar from the overlap loop similarly)."""
        return not any(r.grammar is not None for r in self.running_batch.reqs)

    def _overlap_allowed(self) -> bool:
        return self.enable_overlap and self._no_grammar()

    def _forward_decode_normal(self) -> List[ReqStrOutput]:
        batch = self.running_batch
        outputs: List[ReqStrOutput] = []
        # single-step decode advances tokens outside the multi-step chain:
        # the chain's device-resident ids/base go stale
        self._break_chain()
        overlap = self._overlap_allowed()
        # in-flight step's batch must be exactly the current reqs to chain
        chained = (
            overlap
            and self._inflight is not None
            and self._inflight[0] == batch.reqs
        )
        if self._inflight is not None and not chained:
            outputs += self._resolve_inflight()
            if not batch.reqs:
                return outputs
            chained = False

        arrays = batch.prepare_for_decode(with_input_ids=not chained)
        if arrays is None:
            # OOM: resolve first (retract needs exact state). Resolution
            # finishes in-flight requests and releases their radix refs, so
            # pages that were un-evictable a moment ago may now be free —
            # evict + retry BEFORE retracting (measured: alloc-time evicts
            # freed 0 pages while the in-flight chunk pinned them, then the
            # same evict freed 100+ pages right after resolution).
            outputs += self._resolve_inflight()
            chained = False
            batch.filter_finished()
            if not batch.reqs:
                return outputs
            self.radix_cache.evict(1 << 30)
            arrays = batch.prepare_for_decode()
        if arrays is None:
            retracted = batch.retract_decode(
                lambda r: self._release_req(r, insert=False)
            )
            self.stats.num_retractions += len(retracted)
            from sglang_tpu.managers.schedule_policy import (
                NEW_TOKEN_RATIO_RETRACT_BUMP,
            )

            self.new_token_ratio = min(
                1.0, self.new_token_ratio + NEW_TOKEN_RATIO_RETRACT_BUMP
            )
            for r in reversed(retracted):
                self.waiting_queue.insert(0, r)
            logger.warning(
                "decode OOM: retracted %d reqs (running=%d)",
                len(retracted),
                len(batch.reqs),
            )
            if not batch.reqs:
                return outputs
            arrays = batch.prepare_for_decode()
            if arrays is None:
                return outputs
            chained = False
        sinfo = self._make_sinfo(
            batch.reqs,
            padded_bs=_bucket(len(batch.reqs), self.runner.decode_bs_buckets),
        ).to_sinfo()
        input_ids = self._inflight[3] if chained else arrays["input_ids"]
        next_ids, tok_lp = self.runner.forward_decode(
            input_ids,
            arrays["positions"],
            arrays["out_cache_loc"],
            arrays["page_table"],
            arrays["seq_lens"],
            sinfo,
            lora_ids=self._lora_ids_per_seq(batch.reqs),
            mrope_delta=self._mrope_deltas(batch.reqs),
        )
        batch.commit_decode()
        self.stats.num_decode_steps += 1
        prev = self._inflight if chained else None
        inflight = (list(batch.reqs), next_ids, tok_lp, next_ids)
        if overlap:
            self._inflight = inflight
            if prev is not None:
                outputs += self._process_decode_result(prev)
            return outputs
        outputs += self._process_decode_result(inflight)
        return outputs

    def _resolve_inflight(self) -> List[ReqStrOutput]:
        if self._inflight is None:
            return []
        inflight = self._inflight
        self._inflight = None
        return self._process_decode_result(inflight)

    def _process_decode_result(self, inflight) -> List[ReqStrOutput]:
        reqs, ids_dev, lp_dev, _ = inflight
        # ONE batched device_get: fetching the two arrays separately costs
        # two serial ~26 ms tunnel round trips (measured via online TPOT:
        # 33.8 ms/token at chain depth 4 vs ~21 expected)
        import jax as _jax

        ids, lp = _jax.device_get((ids_dev, lp_dev))
        ids = np.asarray(ids)
        lp = np.asarray(lp)
        if ids.ndim == 1:  # single-step chunk
            ids = ids[None]
            lp = lp[None]
        k_steps = ids.shape[0]
        outputs: List[ReqStrOutput] = []
        n_tok = 0
        for i, r in enumerate(reqs):
            if r.finished():
                # finished at an earlier resolution (wasted rows) — except
                # client aborts, which still need release + notification
                if (
                    r.status == ReqStatus.ABORTED
                    and r.pages
                    and r not in self._deferred
                ):
                    outputs.append(self._finish_req(r))
                continue
            for k in range(k_steps):
                self._append_token(r, int(ids[k, i]), float(lp[k, i]))
                n_tok += 1
                if r.finished():
                    break
            jumped = False
            if (
                not r.finished()
                and r.grammar is not None
                and self._inflight is None  # never while a step is in flight
            ):
                jumped = self._try_jump_forward(r)
            if r.finished():  # (a jump may complete it via a stop string)
                outputs.append(self._finish_req(r))
                continue
            if jumped:
                continue
            if r.stream and (
                len(r.output_ids) % self.server_args.stream_interval < k_steps
            ):
                out = self._emit_stream(r)
                if out:
                    outputs.append(out)
        self.stats.num_decode_tokens += n_tok
        self.running_batch.filter_finished()
        if not self.running_batch.reqs and self._inflight is None:
            # all live rows done and nothing in flight: release zombies so
            # idle pool accounting is exact between bursts
            self._break_chain()
        return outputs

    # --------------------------------------------------------- jump-forward

    JUMP_FORWARD_MIN_CHARS = 4

    def _try_jump_forward(self, r: Req) -> bool:
        """Constrained decoding jump-forward (reference
        `jump_forward_cache` / outlines_jump_forward): when the grammar DFA
        forces a unique character chain, append its tokens without model
        forwards and re-admit the request through the prefill path (the
        radix cache holds the computed prefix, so the re-prefill computes
        only the injected tokens). Returns True if the request was jumped
        (it left the running batch)."""
        if self.tokenizer is None or r.grammar.finished:
            return False
        js, _ = r.grammar.jump_forward()
        if len(js) < self.JUMP_FORWARD_MIN_CHARS:
            return False
        budget = r.sampling_params.max_new_tokens - len(r.output_ids)
        toks = self.tokenizer.encode(js, add_special_tokens=False)
        if not toks or len(toks) >= budget:
            return False
        # validate without mutating: the token strings must walk the DFA
        # through exactly the forced chars (tokenization healing can
        # produce tokens whose surface differs — abort the jump then)
        fsm = r.grammar.fsm
        strs = [fsm.token_string(int(t)) for t in toks]
        if any(s is None for s in strs) or "".join(strs) != js:
            return False
        st = r.grammar.state
        for t in toks:
            st = fsm.advance(st, int(t))
            if st < 0:
                return False
        n_appended = 0
        for t in toks:  # real append: grammar, detok, finish checks
            self._append_token(r, int(t), 0.0)
            n_appended += 1
            if r.finished():
                break
        self.stats.num_jump_forward_tokens += n_appended
        if r.finished():
            # the jump completed the generation (stop string inside the
            # forced text); caller emits the finish — no retract needed
            return False
        # leave the running batch; re-admission re-prefills the injected
        # tokens on top of the radix-cached prefix
        if r in self.running_batch.reqs:
            self.running_batch.reqs.remove(r)
        self._release_req(r, insert=True)
        r.reset_for_retract()
        self.waiting_queue.insert(0, r)
        return True

    # -------------------------------------------------------- bookkeeping

    def _append_token(self, r: Req, token_id: int, logprob: float) -> None:
        ts = time.time()
        if r.first_token_time is None:
            r.first_token_time = ts
            self.metrics.ttft.observe(ts - r.arrival_time)
        elif r.last_token_time is not None:
            self.metrics.itl.observe(ts - r.last_token_time)
        r.last_token_time = ts
        r.output_ids.append(token_id)
        if r.return_logprob:
            r.output_token_logprobs.append(logprob)
        if r.grammar is not None and not r.finished():
            ok = r.grammar.accept_token(token_id)
            if not ok:
                # defensive: the vocab mask makes dead states unreachable,
                # but never let an invalid constrained stream keep going
                r.finished_reason = FinishReason("stop", matched="grammar-dead")
                r.status = ReqStatus.FINISHED
                return
        stop_hit = None
        if self.tokenizer is not None:
            r.detok.step(r.output_ids)
            sp = r.sampling_params
            if sp.stop_strs:
                hit = r.detok.find_stop(sp.stop_strs, sp.stop_str_max_len)
                if hit is not None:
                    stop_hit, idx = hit
                    if not sp.no_stop_trim:
                        r.detok.decoded_text = r.detok.decoded_text[:idx]
        if r.status == ReqStatus.ABORTED:
            return
        r.check_finished(stop_str_hit=stop_hit)

    def _mrope_chunk_arrays(self, reqs):
        """[3, t] rope positions for this extend chunk, or None when no
        request uses M-RoPE. Positions beyond the prompt (retraction
        re-prefill, mixed decode rows) advance all axes by the request's
        delta."""
        if not any(r.mrope_positions is not None for r in reqs):
            return None
        cols = []
        for r in reqs:
            for p in range(r.kv_len, r.kv_len + r._extend_len):
                if r.mrope_positions is not None:
                    p3 = np.asarray(r.mrope_positions)
                    if p < p3.shape[1]:
                        cols.append(p3[:, p])
                    else:
                        cols.append(np.full(3, p + (r.mrope_delta or 0)))
                else:
                    cols.append(np.full(3, p))
        return np.stack(cols, axis=1).astype(np.int32)

    def _mm_chunk_arrays(self, reqs):
        """(rows, embeds) for image-token positions covered by this extend
        chunk; None when the batch is text-only (reference mm embedding
        scatter, `mm_utils.general_mm_embed_routine`)."""
        if not any(r.mm_embeds is not None for r in reqs):
            return None, None
        rows_list, emb_list = [], []
        row_off = 0
        for r in reqs:
            el = r._extend_len
            if r.mm_embeds is not None:
                pos = np.asarray(r.mm_positions)
                sel = (pos >= r.kv_len) & (pos < r.kv_len + el)
                if sel.any():
                    rows_list.append(row_off + (pos[sel] - r.kv_len))
                    emb_list.append(np.asarray(r.mm_embeds)[sel])
            row_off += el
        if not rows_list:
            return None, None
        return (
            np.concatenate(rows_list).astype(np.int32),
            np.concatenate(emb_list).astype(np.float32),
        )

    def _insertable_len(self, r: Req) -> int:
        """Page-aligned span safe to publish: multi-step chunks advance
        kv_len past the kept tokens (over-generated tail is discarded), and
        the last kept token's KV may be unwritten — cap at len(fill)-1."""
        return round_down(
            min(r.kv_len, len(r.fill_ids) - 1), self.page_size
        )

    def _cache_unfinished(self, r: Req) -> None:
        """Insert the page-aligned computed prefix into the radix tree
        (reference `cache_unfinished_req`, `radix_cache.py:490`).
        Multimodal requests key on `cache_ids` (content-hash surrogates
        at image positions), so multi-turn VLM chats hit cache."""
        if self.radix_cache.disable:
            return
        aligned = self._insertable_len(r)
        if aligned > 0:
            # KV events are published from inside radix insert with the
            # pages the tree actually retained (never request duplicates)
            self.radix_cache.insert(
                r.cache_ids[:aligned], r.pages[: aligned // self.page_size]
            )
            # move the request's tree lock onto the inserted path: a
            # running request's own prefix must NOT count as evictable —
            # evicting it frees nothing (the request still holds allocator
            # refs), and counting it let admission over-admit by the whole
            # running set's prompt footprint (measured: 173 admitted into a
            # pool that fits ~130 -> 26 retract/re-prefill cycles per pass)
            m = self.radix_cache.match_prefix(r.cache_ids[:aligned])
            if m.length > 0 and m.node is not None:
                self.radix_cache.lock_path(m.node)
                if r.last_node is not None:
                    self.radix_cache.unlock(r.last_node)
                r.last_node = m.node

    def _release_req(self, r: Req, insert: bool) -> None:
        """Return a request's KV to the pool; optionally publish its prefix
        to the radix tree first (reference `cache_finished_req`)."""
        if insert and not self.radix_cache.disable:
            aligned = self._insertable_len(r)
            if aligned > 0:
                self.radix_cache.insert(
                    r.cache_ids[:aligned], r.pages[: aligned // self.page_size]
                )
                if self.hicache is not None:
                    self.hicache.write_through(
                        r.cache_ids[:aligned], r.pages[: aligned // self.page_size]
                    )
        if r.last_node is not None:
            self.radix_cache.unlock(r.last_node)
            r.last_node = None
        self.allocator.free(r.pages)
        r.pages = []
        if self.draft_worker is not None:
            self.draft_worker.drop(r.rid)
        if r.slot is not None:
            self._slot_pool.append(r.slot)
            r.slot = None

    def _finish_req(self, r: Req) -> ReqStrOutput:
        if self._chain_rows is not None and r in self._chain_rows:
            # zombie row: pages/slot stay pinned (the device chain keeps
            # decoding this row into its own lookahead pages) — released
            # with radix insert at the next chain break
            self._deferred.append(r)
        else:
            self._release_req(r, insert=True)
        if r.lora_id >= 0 and self.runner.lora_manager is not None:
            self.runner.lora_manager.release(r.lora_id)
            r.lora_id = -1
        self.reqs.pop(r.rid, None)
        self.stats.num_finished += 1
        ts = time.time()
        self.metrics.e2e.observe(ts - r.arrival_time)
        if r.queue_time is not None:
            self.metrics.queue.observe(max(0.0, r.queue_time - r.arrival_time))
        if self.span_log.path is not None or self.span_log.otlp is not None:
            # arrival/scheduled/prefill_done are monotonic-clock stamps
            # (scheduling math needs monotonicity); shift them onto the
            # wall clock so every span event shares one time base
            off = ts - time.monotonic()
            events = {"arrival": r.arrival_time + off, "finish": ts}
            if r.queue_time is not None:
                events["scheduled"] = r.queue_time + off
            if r.prefill_finished_time is not None:
                events["prefill_done"] = r.prefill_finished_time + off
            if r.first_token_time is not None:
                events["first_token"] = r.first_token_time
            self.span_log.emit(
                r.rid,
                events,
                {
                    "prompt_tokens": len(r.input_ids),
                    "completion_tokens": len(r.output_ids),
                    "cached_tokens": r.cached_tokens,
                    "retractions": r.retract_count,
                    "finish_reason": (
                        r.finished_reason.kind if r.finished_reason else ""
                    ),
                },
            )
        return self._make_output(r, finished=True)

    def _emit_stream(self, r: Req) -> Optional[ReqStrOutput]:
        return self._make_output(r, finished=False)

    def _make_output(self, r: Req, finished: bool) -> ReqStrOutput:
        if self.tokenizer is not None:
            new_text = r.detok.emit()
            full = r.detok.decoded_text[: r.detok.sent_offset]
        else:
            new_text = ""
            full = ""
        ttft = (
            r.prefill_finished_time - r.arrival_time
            if r.prefill_finished_time
            else None
        )
        return ReqStrOutput(
            rid=r.rid,
            output_str=full,
            new_text=new_text,
            finished=finished,
            finish_reason=r.finished_reason if finished else None,
            prompt_tokens=len(r.input_ids),
            completion_tokens=len(r.output_ids),
            cached_tokens=r.cached_tokens,
            output_ids=list(r.output_ids),
            output_token_logprobs=(
                list(r.output_token_logprobs) if r.return_logprob else None
            ),
            ttft=ttft,
        )

    # ------------------------------------------------------------ control

    def flush_cache(self) -> bool:
        """Drop the radix tree (only when idle) — reference `/flush_cache`."""
        if self.running_batch.reqs or self.waiting_queue or self.chunked_req:
            return False
        freed = self.radix_cache.evict(1 << 60)
        self.radix_cache.reset()
        if self.kv_events is not None:
            self.kv_events.all_cleared()
        logger.info("flushed radix cache: %d pages freed", freed)
        return True

    def check_memory(self) -> int:
        """Leaked pages when fully idle (reference `scheduler.py:3349
        is_fully_idle` runtime check). Tree-held pages are not leaks;
        neither are in-flight decode chunks or zombie chain rows — both
        are transient pinned state, quiesced before counting."""
        if not self.running_batch.reqs and not self.waiting_queue:
            if self._inflight is not None:
                self._resolve_inflight()
            self._break_chain()
        held = self.allocator.check_leaks()
        return held - self.radix_cache.total_pages


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]
