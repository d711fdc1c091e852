"""Continuous-batching scheduler behavior tests.

Parity with the reference's scheduler-policy unit tests
(`test/manual/test_schedule_policy.py`) and radix-cache server kit
(`python/sglang/test/kits/radix_cache_server_kit.py`), run hardware-free on
the jax CPU backend with dummy weights (the reference's DummyModelLoader
seam, `model_loader/loader.py:1294`).
"""

import uuid

import numpy as np
import pytest

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def make_scheduler(**over):
    sa = tiny_server_args(**over)
    return Scheduler(sa, tiny_runner(sa))


def submit(sched, ids, max_new_tokens=8, **sp):
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid,
            input_ids=list(ids),
            sampling_params=SamplingParams(
                max_new_tokens=max_new_tokens, ignore_eos=True, temperature=0.0, **sp
            ),
        )
    )
    return rid


def run_all(sched, max_steps=500):
    outs = {}
    steps = 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < max_steps, "scheduler did not converge"
    return outs


@pytest.fixture(scope="module")
def sched():
    return make_scheduler()


def test_single_request_completes(sched):
    rid = submit(sched, [5, 6, 7], max_new_tokens=4)
    outs = run_all(sched)
    assert rid in outs
    o = outs[rid]
    assert o.finished and o.finish_reason.kind == "length"
    assert len(o.output_ids) == 4
    assert o.prompt_tokens == 3
    # idle leak check (reference scheduler.py:3349)
    assert sched.check_memory() == 0


def test_batch_mixed_lengths(sched):
    rng = np.random.default_rng(0)
    rids = [
        submit(sched, rng.integers(3, 250, size=n).tolist(), max_new_tokens=m)
        for n, m in [(5, 3), (40, 6), (17, 2), (90, 5)]
    ]
    outs = run_all(sched)
    for rid, m in zip(rids, [3, 6, 2, 5]):
        assert len(outs[rid].output_ids) == m
    assert sched.check_memory() == 0


def test_determinism_same_prompt_same_output(sched):
    prompt = [11, 22, 33, 44, 55]
    r1 = submit(sched, prompt, max_new_tokens=6)
    o1 = run_all(sched)[r1]
    r2 = submit(sched, prompt, max_new_tokens=6)
    o2 = run_all(sched)[r2]
    assert o1.output_ids == o2.output_ids


def test_prefix_cache_hit(sched):
    sched.flush_cache()
    prefix = list(range(3, 3 + 64))  # 4 pages of 16
    r1 = submit(sched, prefix + [100], max_new_tokens=2)
    run_all(sched)
    r2 = submit(sched, prefix + [101], max_new_tokens=2)
    outs = run_all(sched)
    assert outs[r2].cached_tokens >= 48  # at least 3 full pages reused
    assert sched.check_memory() == 0


def test_chunked_prefill():
    sched = make_scheduler(chunked_prefill_size=32, max_prefill_tokens=32)
    long_prompt = list(np.random.default_rng(1).integers(3, 250, size=100))
    rid = submit(sched, [int(x) for x in long_prompt], max_new_tokens=3)
    outs = run_all(sched)
    assert len(outs[rid].output_ids) == 3
    assert sched.stats.num_prefill_steps >= 4  # 100 tokens / 32-chunk
    assert sched.check_memory() == 0


def test_retraction_under_memory_pressure():
    # Tiny pool: 8 pages x 16 tokens = 128 tokens total.
    sched = make_scheduler(max_total_tokens=128, page_size=16)
    rng = np.random.default_rng(2)
    rids = [
        submit(sched, rng.integers(3, 250, size=30).tolist(), max_new_tokens=40)
        for _ in range(4)
    ]
    outs = run_all(sched, max_steps=2000)
    for rid in rids:
        assert rid in outs, "request starved after retraction"
        assert len(outs[rid].output_ids) == 40
    assert sched.check_memory() == 0


def test_eos_stops_generation():
    sched = make_scheduler()
    # ignore_eos=False and eos set to every token -> stops at 1 token
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid,
            input_ids=[5, 6, 7],
            sampling_params=SamplingParams(
                max_new_tokens=50,
                temperature=0.0,
                stop_token_ids=list(range(256)),
            ),
        )
    )
    outs = run_all(sched)
    assert len(outs[rid].output_ids) == 1
    assert outs[rid].finish_reason.kind == "stop"


def test_abort_waiting_request(sched):
    rid = submit(sched, [1, 2, 3], max_new_tokens=5)
    assert sched.abort_request(rid)
    outs = run_all(sched)
    assert rid not in outs


def test_max_running_requests_respected():
    sched = make_scheduler(max_running_requests=2)
    rids = [submit(sched, [int(i), 2, 3], max_new_tokens=10) for i in range(5)]
    max_run = 0
    while sched.has_work():
        sched.step()
        max_run = max(max_run, len(sched.running_batch.reqs))
    assert max_run <= 2


def test_mixed_chunk_equivalence():
    """Mixed prefill+decode rows (--enable-mixed-chunk) must not change
    any request's greedy output, while decode progresses during prefill
    rounds."""
    import numpy as np

    from tests.test_utils import tiny_runner, tiny_server_args

    rng = np.random.default_rng(5)
    early = rng.integers(3, 250, size=9).tolist()
    late = [rng.integers(3, 250, size=100).tolist() for _ in range(3)]

    def run(mixed):
        sa = tiny_server_args(
            enable_mixed_chunk=mixed, chunked_prefill_size=64,
            prefill_token_buckets=[64, 128],
        )
        sched = Scheduler(sa, tiny_runner(sa))
        rids = [submit(sched, early, n=30)]
        outs, steps = {}, 0
        started_late = False
        while sched.has_work() or not started_late:
            if steps == 2 and not started_late:
                # long prompts arrive while `early` is decoding
                rids += [submit(sched, p, n=6) for p in late]
                started_late = True
            for o in sched.step():
                if o.finished:
                    outs[o.rid] = o
            steps += 1
            assert steps < 500
        assert sched.check_memory() == 0
        return [outs[r].output_ids for r in rids], sched

    base, _ = run(False)
    got, sched = run(True)
    assert got == base
    # decode tokens were produced during prefill steps (the whole point)
    assert sched.stats.num_decode_tokens > 0


def test_abort_chunked_request_releases_pages():
    """Regression: aborting a request mid-chunked-prefill (it is WAITING
    but no longer in the waiting queue) must not raise, must drop it as
    the chunked req, and must return its pages to the pool."""
    sched = make_scheduler(chunked_prefill_size=32, max_prefill_tokens=32)
    long_prompt = np.random.default_rng(3).integers(3, 250, size=100)
    rid = submit(sched, [int(x) for x in long_prompt], max_new_tokens=3)
    sched.step()  # first chunk: request becomes sched.chunked_req
    assert sched.chunked_req is not None and sched.chunked_req.rid == rid
    assert sched.abort_request(rid)
    assert sched.chunked_req is None
    assert rid not in sched.reqs
    assert not sched.has_work()
    assert sched.check_memory() == 0


def test_priority_preemption():
    """A strictly-higher-priority waiting request retracts low-priority
    running ones when the pool blocks admission (reference
    `schedule_policy.py:1008 preempt_to_schedule`)."""
    # 240 tokens: enough for honest (reserve-aware) admission of both
    # low-priority requests (2 x ceil((48+60)/16)*16 = 224), but not for a
    # third concurrent request
    sched = make_scheduler(
        max_total_tokens=240,
        page_size=16,
        schedule_policy="priority",
        enable_priority_preemption=True,
    )
    rng = np.random.default_rng(3)
    # two low-priority requests that fill the pool
    low = [
        submit(sched, rng.integers(3, 250, size=48).tolist(), max_new_tokens=60)
        for _ in range(2)
    ]
    for _ in range(6):
        sched.step()  # admit + run a few decode rounds
    assert len(sched.running_batch.reqs) == 2
    # high-priority request arrives; pool is full
    hi_rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=hi_rid,
            input_ids=rng.integers(3, 250, size=48).tolist(),
            sampling_params=SamplingParams(
                max_new_tokens=8, ignore_eos=True, temperature=0.0
            ),
            priority=10,
        )
    )
    preempted = False
    for _ in range(40):
        sched.step()
        running_rids = {r.rid for r in sched.running_batch.reqs}
        if hi_rid in running_rids and len(running_rids & set(low)) < 2:
            preempted = True
            break
    assert preempted, "high-priority request did not preempt"
    outs = run_all(sched, max_steps=3000)
    assert hi_rid in outs
    for rid in low:  # preempted requests still finish eventually
        assert rid in outs
        assert len(outs[rid].output_ids) == 60
    assert sched.check_memory() == 0


def test_waiting_queue_timeout_abort():
    """Requests stuck in the waiting queue longer than the limit abort
    with an abort finish reason (reference `scheduler.py:1537`)."""
    import time as _time

    sched = make_scheduler(
        max_total_tokens=128, page_size=16, waiting_queue_timeout=0.05,
        max_running_requests=1,
    )
    rng = np.random.default_rng(4)
    r1 = submit(sched, rng.integers(3, 250, size=40).tolist(), max_new_tokens=50)
    sched.step()  # admit r1
    r2 = submit(sched, rng.integers(3, 250, size=40).tolist(), max_new_tokens=4)
    _time.sleep(0.08)
    outs = run_all(sched, max_steps=3000)
    assert r1 in outs and len(outs[r1].output_ids) == 50
    assert r2 in outs
    assert outs[r2].finish_reason is not None
    assert outs[r2].finish_reason.kind == "abort"
    assert sched.check_memory() == 0
