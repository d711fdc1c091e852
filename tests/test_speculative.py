"""NGRAM speculative decoding tests (reference `spec_decoding_kit` +
`test/registered/spec` category): proposer units + the core guarantee that
speculative output is IDENTICAL to plain greedy decoding."""

import uuid

import numpy as np
import pytest

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from sglang_tpu.speculative.ngram_worker import NgramProposer, accept_draft_greedy
from tests.test_utils import tiny_runner, tiny_server_args


def test_proposer_finds_repeats():
    p = NgramProposer(min_match=1, max_match=3, num_draft_tokens=3)
    # history: "1 2 3 4 1 2" -> trailing [1,2] matched earlier -> draft [3,4,1]
    assert p.propose([1, 2, 3, 4, 1, 2]) == [3, 4, 1]
    # no repeat anywhere
    assert p.propose([1, 2, 3, 4, 5]) == []
    assert p.propose([7]) == []


def test_accept_draft_greedy():
    # target ids at positions 0..k; draft accepted while it matches target
    assert accept_draft_greedy(np.array([5, 6, 7]), [5, 6]) == [5, 6, 7]
    assert accept_draft_greedy(np.array([5, 6, 7]), [5, 9]) == [5, 6]
    assert accept_draft_greedy(np.array([5, 6, 7]), [4, 6]) == [5]
    assert accept_draft_greedy(np.array([5]), []) == [5]


def run_all(sched, rids, max_steps=500):
    outs = {}
    steps = 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < max_steps
    return outs


def submit(sched, ids, n=24):
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid,
            input_ids=list(ids),
            sampling_params=SamplingParams(
                max_new_tokens=n, temperature=0.0, ignore_eos=True
            ),
        )
    )
    return rid


def test_spec_output_identical_to_greedy():
    sa_base = tiny_server_args()
    sched_base = Scheduler(sa_base, tiny_runner(sa_base))
    sa_spec = tiny_server_args(speculative_algorithm="NGRAM")
    sched_spec = Scheduler(sa_spec, tiny_runner(sa_spec))
    assert sched_spec.spec is not None

    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 250, size=n).tolist() for n in (7, 21, 40)]
    base_out = {}
    spec_out = {}
    for sched, sink in ((sched_base, base_out), (sched_spec, spec_out)):
        rids = [submit(sched, p) for p in prompts]
        outs = run_all(sched, rids)
        for i, rid in enumerate(rids):
            sink[i] = outs[rid].output_ids
    for i in range(len(prompts)):
        assert spec_out[i] == base_out[i], f"prompt {i} diverged"
    # tiny greedy models loop quickly -> ngram hits -> fewer decode steps
    assert sched_spec.stats.num_decode_steps < sched_base.stats.num_decode_steps
    assert sched_spec.check_memory() == 0


def test_spec_with_mixed_sampling_falls_back():
    sa = tiny_server_args(speculative_algorithm="NGRAM")
    sched = Scheduler(sa, tiny_runner(sa))
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid,
            input_ids=[5, 6, 7],
            sampling_params=SamplingParams(
                max_new_tokens=8, temperature=0.9, ignore_eos=True
            ),
        )
    )
    outs = run_all(sched, [rid])
    assert len(outs[rid].output_ids) == 8
