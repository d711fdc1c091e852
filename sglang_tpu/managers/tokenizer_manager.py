"""Async request facade: tokenize -> schedule (pump thread) -> stream out.

Parity with reference `srt/managers/tokenizer_manager.py:219 TokenizerManager`
(`generate_request:519` validate/tokenize/dispatch, `_wait_one_response:1288`
demux). TPU-native difference: the scheduler is not a ZMQ-connected
subprocess — it runs on a dedicated thread in THIS process (one engine
process per host), and the asyncio side talks to it through a thread-safe
inbox + per-request asyncio queues.
"""

from __future__ import annotations

import asyncio
import queue as queue_mod
import threading
import time
import uuid
from typing import AsyncGenerator, Dict, Tuple

from sglang_tpu.managers.io_struct import (
    AbortReq,
    GenerateReqInput,
    ReqStrOutput,
    TokenizedGenerateReqInput,
)
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.server_args import ServerArgs
from sglang_tpu.utils import get_logger

logger = get_logger(__name__)


class TokenizerManager:
    def __init__(self, server_args: ServerArgs, scheduler: Scheduler, tokenizer):
        self.server_args = server_args
        self.scheduler = scheduler
        self.tokenizer = tokenizer
        self._inbox: queue_mod.Queue = queue_mod.Queue()
        # pause/continue generation (reference /pause_generation route +
        # gRPC PauseGeneration): while paused the pump keeps serving
        # control items but does not step the scheduler
        self.paused = False
        self._subscribers: Dict[str, Tuple[asyncio.AbstractEventLoop, asyncio.Queue]] = {}
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._pump_loop, name="scheduler-pump", daemon=True
        )
        self._last_heartbeat = time.monotonic()
        self._thread.start()
        # soft watchdog (reference `utils/watchdog.py` + SubprocessWatchdog):
        # if the pump thread stops making progress while work is pending,
        # fail all waiters so clients see an error instead of a hang
        self._watchdog = threading.Thread(
            target=self._watchdog_loop, name="scheduler-watchdog", daemon=True
        )
        self._watchdog.start()

    # --------------------------------------------------------------- pump

    def _pump_loop(self):
        """The scheduler event loop (reference `event_loop_normal`,
        `scheduler.py:1586`), driven on one thread."""
        while not self._stop.is_set():
            moved = self._drain_inbox()
            if self.paused:
                if not moved:
                    time.sleep(0.005)
                self._last_heartbeat = time.monotonic()
                continue
            if self.scheduler.has_work():
                try:
                    outputs = self.scheduler.step()
                except Exception as e:  # engine-fatal: fail all live reqs
                    logger.exception("scheduler step failed")
                    from sglang_tpu.observability.state_capturer import (
                        write_crash_dump,
                    )

                    write_crash_dump(
                        self.scheduler, e,
                        getattr(self.server_args, "crash_dump_dir", None),
                    )
                    self._fail_all(str(e))
                    continue
                for out in outputs:
                    self._publish(out)
                self._last_heartbeat = time.monotonic()
            elif not moved:
                try:
                    item = self._inbox.get(timeout=0.02)
                except queue_mod.Empty:
                    continue
                try:
                    self._handle_inbox_item(item)
                except Exception:
                    logger.exception("inbox item failed")

    def _watchdog_loop(self):
        timeout = self.server_args.watchdog_timeout
        while not self._stop.is_set():
            time.sleep(min(timeout / 4, 15.0))
            if not self.scheduler.has_work():
                continue
            stalled = time.monotonic() - self._last_heartbeat
            if stalled > timeout:
                logger.critical(
                    "scheduler stalled for %.0fs (watchdog_timeout=%.0fs); "
                    "failing %d in-flight requests",
                    stalled,
                    timeout,
                    len(self._subscribers),
                )
                self._fail_all("scheduler watchdog timeout")
                self._last_heartbeat = time.monotonic()

    def _drain_inbox(self) -> bool:
        moved = False
        while True:
            try:
                item = self._inbox.get_nowait()
            except queue_mod.Empty:
                return moved
            try:
                self._handle_inbox_item(item)
            except Exception:
                # never let a malformed control item kill the pump thread
                logger.exception("inbox item failed")
            moved = True

    def _handle_inbox_item(self, item):
        if isinstance(item, tuple) and item and item[0] == "call":
            # run a device-touching job on the pump thread (encode, weight
            # update, flush) so it never races the scheduler's step
            _, fn, loop, fut = item
            try:
                result = fn()
                loop.call_soon_threadsafe(fut.set_result, result)
            except Exception as e:  # propagate to the awaiting coroutine
                loop.call_soon_threadsafe(fut.set_exception, e)
            return
        if isinstance(item, tuple) and item and item[0] == "call_sync":
            # same, for plain-thread callers (PD KV transfer server):
            # the callable handles its own result/exception delivery
            item[1]()
            return
        if isinstance(item, TokenizedGenerateReqInput):
            try:
                self.scheduler.add_request(item)
            except Exception as e:
                self._publish(
                    ReqStrOutput(
                        rid=item.rid,
                        output_str="",
                        new_text="",
                        finished=True,
                        finish_reason=_abort_reason(str(e)),
                    )
                )
        elif isinstance(item, AbortReq):
            self.scheduler.abort_request(item.rid)
            # a WAITING req is dropped silently by the scheduler; make sure
            # the waiter is released
            with self._lock:
                sub = self._subscribers.get(item.rid)
            if sub is not None and item.rid not in self.scheduler.reqs:
                self._publish(
                    ReqStrOutput(
                        rid=item.rid,
                        output_str="",
                        new_text="",
                        finished=True,
                        finish_reason=_abort_reason("aborted by client"),
                    )
                )

    def _fail_all(self, message: str):
        with self._lock:
            rids = list(self._subscribers)
        for rid in rids:
            self._publish(
                ReqStrOutput(
                    rid=rid,
                    output_str="",
                    new_text="",
                    finished=True,
                    finish_reason=_abort_reason(message),
                )
            )

    def _publish(self, out: ReqStrOutput):
        with self._lock:
            sub = self._subscribers.get(out.rid)
            if out.finished and sub is not None:
                del self._subscribers[out.rid]
        if sub is None:
            return
        loop, q = sub
        loop.call_soon_threadsafe(q.put_nowait, out)

    # ---------------------------------------------------------------- API

    def tokenize(self, g: GenerateReqInput) -> TokenizedGenerateReqInput:
        if g.input_ids is not None:
            ids = list(g.input_ids)
        else:
            if self.tokenizer is None:
                raise ValueError("text input requires a tokenizer")
            ids = self.tokenizer.encode(g.text)
        sp = (
            g.sampling_params
            if isinstance(g.sampling_params, SamplingParams)
            else SamplingParams.from_dict(g.sampling_params)
        )
        return TokenizedGenerateReqInput(
            rid=g.rid or uuid.uuid4().hex,
            input_ids=ids,
            sampling_params=sp,
            return_logprob=g.return_logprob,
            top_logprobs_num=g.top_logprobs_num,
            stream=g.stream,
            lora_path=g.lora_path,
            arrival_time=time.monotonic(),
        )

    async def generate_request(
        self, treq: TokenizedGenerateReqInput
    ) -> AsyncGenerator[ReqStrOutput, None]:
        """Submit one tokenized request; yields incremental outputs until
        finished. Cancellation aborts the request in the scheduler."""
        loop = asyncio.get_running_loop()
        q: asyncio.Queue = asyncio.Queue()
        with self._lock:
            self._subscribers[treq.rid] = (loop, q)
        self._inbox.put(treq)
        try:
            while True:
                out = await q.get()
                yield out
                if out.finished:
                    return
        finally:
            with self._lock:
                self._subscribers.pop(treq.rid, None)
            if not self._stop.is_set():
                self._inbox.put(AbortReq(treq.rid))

    def abort_request(self, rid: str):
        self._inbox.put(AbortReq(rid))

    async def run_on_scheduler(self, fn):
        """Execute `fn` on the pump thread between scheduler steps."""
        loop = asyncio.get_running_loop()
        fut = loop.create_future()
        self._inbox.put(("call", fn, loop, fut))
        return await fut

    def is_healthy(self) -> bool:
        return self._thread.is_alive()

    def shutdown(self):
        self._stop.set()
        self._thread.join(timeout=5)


def _abort_reason(message: str):
    from sglang_tpu.managers.io_struct import FinishReason

    return FinishReason("abort", message=message)
