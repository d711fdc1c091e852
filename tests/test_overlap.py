"""Overlap-schedule equivalence: outputs must be identical with and without
the in-flight pipelined decode step (reference `event_loop_overlap` vs
`event_loop_normal` equivalence)."""

import uuid

import numpy as np

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def run_workload(sched, prompts, max_new=12, temperature=0.0):
    rids = []
    for p in prompts:
        rid = uuid.uuid4().hex
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=rid,
                input_ids=p,
                sampling_params=SamplingParams(
                    max_new_tokens=max_new, temperature=temperature, ignore_eos=True
                ),
            )
        )
        rids.append(rid)
    outs = {}
    steps = 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o.output_ids
        steps += 1
        assert steps < 1000
    return [outs[r] for r in rids]


def test_overlap_matches_sync():
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 250, size=n).tolist() for n in (5, 18, 33, 47)]
    sa_sync = tiny_server_args(enable_overlap_schedule=False)
    sa_ovl = tiny_server_args(enable_overlap_schedule=True)
    out_sync = run_workload(Scheduler(sa_sync, tiny_runner(sa_sync)), prompts)
    out_ovl = run_workload(Scheduler(sa_ovl, tiny_runner(sa_ovl)), prompts)
    assert out_sync == out_ovl


def test_overlap_with_staggered_arrivals():
    """Requests arriving mid-decode force inflight resolution + merges."""
    sa = tiny_server_args(enable_overlap_schedule=True)
    sched = Scheduler(sa, tiny_runner(sa))
    rng = np.random.default_rng(1)
    rids = []

    def add(n):
        rid = uuid.uuid4().hex
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=rid,
                input_ids=rng.integers(3, 250, size=n).tolist(),
                sampling_params=SamplingParams(
                    max_new_tokens=10, temperature=0.0, ignore_eos=True
                ),
            )
        )
        rids.append(rid)

    add(7)
    outs = {}
    steps = 0
    while sched.has_work():
        if steps == 3:
            add(15)
        if steps == 6:
            add(9)
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 300
    assert len(outs) == 3
    for rid in rids:
        assert len(outs[rid].output_ids) == 10
    assert sched.check_memory() == 0


def test_multi_step_bucket_transition():
    """Decode-bucket growth mid-run must recompile the fused chunk (a
    closure-captured bucket once silently reused the smaller compile)."""
    sa = tiny_server_args(decode_multi_step=4, max_running_requests=16)
    sched = Scheduler(sa, tiny_runner(sa))
    rng = np.random.default_rng(3)
    rids = []

    def add(n):
        rid = uuid.uuid4().hex
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=rid,
                input_ids=rng.integers(3, 250, size=n).tolist(),
                sampling_params=SamplingParams(
                    max_new_tokens=12, temperature=0.0, ignore_eos=True
                ),
            )
        )
        rids.append(rid)

    add(5)  # bucket 4? -> smallest bucket
    outs = {}
    steps = 0
    while sched.has_work():
        if steps == 2:
            for _ in range(9):  # grow past the first decode bucket
                add(6)
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 500
    assert len(outs) == len(rids)
    for rid in rids:
        assert len(outs[rid].output_ids) == 12
    assert sched.check_memory() == 0


def test_overlap_memory_clean_after_retraction():
    sa = tiny_server_args(
        enable_overlap_schedule=True, max_total_tokens=128, page_size=16
    )
    sched = Scheduler(sa, tiny_runner(sa))
    rng = np.random.default_rng(2)
    rids = []
    for _ in range(4):
        rid = uuid.uuid4().hex
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=rid,
                input_ids=rng.integers(3, 250, size=25).tolist(),
                sampling_params=SamplingParams(
                    max_new_tokens=30, temperature=0.0, ignore_eos=True
                ),
            )
        )
        rids.append(rid)
    outs = {}
    steps = 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 3000
    for rid in rids:
        assert len(outs[rid].output_ids) == 30
    assert sched.check_memory() == 0


def test_zombie_chain_rows_exact_and_clean():
    """Finished requests stay pinned as zombie rows so the chained
    multi-step dispatch never breaks on a finish: outputs must equal the
    single-step sync schedule exactly, zombie pages must be released at
    chain break (no leaks), and zombie prefixes must still land in the
    radix tree (second pass hits cache)."""
    rng = np.random.default_rng(7)
    prompts = [rng.integers(3, 250, size=n).tolist() for n in (6, 17, 25, 31, 40)]
    lens = [3, 7, 15, 26, 40]  # staggered finishes inside chained chunks

    def run(sa, sched=None):
        sched = sched or Scheduler(sa, tiny_runner(sa))
        rids, outs, cached = [], {}, {}
        for p, mn in zip(prompts, lens):
            rid = uuid.uuid4().hex
            sched.add_request(
                TokenizedGenerateReqInput(
                    rid=rid, input_ids=p,
                    sampling_params=SamplingParams(
                        max_new_tokens=mn, temperature=0.0, ignore_eos=True
                    ),
                )
            )
            rids.append(rid)
        steps = 0
        while sched.has_work():
            for o in sched.step():
                if o.finished:
                    outs[o.rid] = o.output_ids
                    cached[o.rid] = o.cached_tokens
            steps += 1
            assert steps < 2000
        return sched, [outs[r] for r in rids], [cached[r] for r in rids]

    sa_ref = tiny_server_args(
        enable_overlap_schedule=False, decode_multi_step=1
    )
    _, ref, _ = run(sa_ref)
    sa = tiny_server_args(
        enable_overlap_schedule=True, decode_multi_step=4,
        max_running_requests=16,
    )
    sched, got, _ = run(sa)
    assert got == ref
    assert sched.check_memory() == 0
    # zombie prefixes were radix-inserted at chain break: a second pass of
    # the same prompts must hit the cache
    _, again, cached2 = run(sa, sched=sched)
    assert again == ref
    # requests long enough to page-align must hit (short ones can't insert)
    ps = sched.page_size
    for (p, mn, c) in zip(prompts, lens, cached2):
        if len(p) + mn >= 2 * ps:
            assert c > 0, (len(p), mn, c)
    assert sched.check_memory() == 0
