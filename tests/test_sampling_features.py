"""Penalties, logit bias, min_new_tokens (reference
`sampling/penaltylib` test coverage, run through the full scheduler)."""

import uuid

import numpy as np
import pytest

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


@pytest.fixture(scope="module")
def sched():
    sa = tiny_server_args()
    return Scheduler(sa, tiny_runner(sa))


def run_one(sched, ids, **sp_kwargs):
    rid = uuid.uuid4().hex
    sp = SamplingParams(temperature=0.0, ignore_eos=True, **sp_kwargs)
    sched.add_request(
        TokenizedGenerateReqInput(rid=rid, input_ids=list(ids), sampling_params=sp)
    )
    out = None
    steps = 0
    while sched.has_work():
        for o in sched.step():
            if o.finished and o.rid == rid:
                out = o
        steps += 1
        assert steps < 500
    return out


def test_frequency_penalty_reduces_repeats(sched):
    prompt = [5, 6, 7]
    base = run_one(sched, prompt, max_new_tokens=10)
    pen = run_one(sched, prompt, max_new_tokens=10, frequency_penalty=5.0)
    # tiny random models loop hard under greedy; a strong frequency penalty
    # must strictly increase diversity
    assert len(set(pen.output_ids)) > len(set(base.output_ids))
    # penalized run never repeats a token more than a couple of times
    counts = np.bincount(pen.output_ids)
    assert counts.max() <= 2


def test_presence_penalty(sched):
    prompt = [9, 10, 11]
    base = run_one(sched, prompt, max_new_tokens=8)
    pen = run_one(sched, prompt, max_new_tokens=8, presence_penalty=10.0)
    assert len(set(pen.output_ids)) == len(pen.output_ids)  # all distinct
    assert len(set(base.output_ids)) < 8


def test_repetition_penalty(sched):
    prompt = [20, 21]
    base = run_one(sched, prompt, max_new_tokens=10)
    pen = run_one(sched, prompt, max_new_tokens=10, repetition_penalty=10.0)
    assert len(set(pen.output_ids)) > len(set(base.output_ids))


def test_logit_bias_forces_token(sched):
    out = run_one(sched, [3, 4], max_new_tokens=5, logit_bias={42: 200.0})
    assert out.output_ids == [42] * 5


def test_logit_bias_bans_token(sched):
    base = run_one(sched, [5, 6, 7], max_new_tokens=5)
    banned = base.output_ids[0]
    out = run_one(
        sched, [5, 6, 7], max_new_tokens=5, logit_bias={banned: -1e9}
    )
    assert banned not in out.output_ids


def test_min_new_tokens_blocks_stop(sched):
    base = run_one(sched, [8, 9], max_new_tokens=10)
    first = base.output_ids[0]
    # stopping token = the greedy first choice; without min_new_tokens the
    # request would finish immediately
    rid = uuid.uuid4().hex
    sp = SamplingParams(
        temperature=0.0,
        max_new_tokens=10,
        min_new_tokens=4,
        stop_token_ids=[first],
    )
    sched.add_request(
        TokenizedGenerateReqInput(rid=rid, input_ids=[8, 9], sampling_params=sp)
    )
    out = None
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                out = o
    assert len(out.output_ids) >= 4
    assert first not in out.output_ids[:3]  # blocked while under the minimum


def test_penalty_state_isolated_between_requests(sched):
    # two interleaved penalized requests must not share counts
    r1 = run_one(sched, [30, 31], max_new_tokens=6, frequency_penalty=5.0)
    r2 = run_one(sched, [30, 31], max_new_tokens=6, frequency_penalty=5.0)
    assert r1.output_ids == r2.output_ids  # deterministic + isolated
