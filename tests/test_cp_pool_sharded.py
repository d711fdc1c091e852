"""Pool-sharded context parallelism (VERDICT r4 item 6): with
`attn_cp_mode=pool-sharded`, cp=4 serves a prompt whose KV exceeds ONE
rank's pool shard — pages stripe across every region and partial
attentions merge exactly — and the output matches a single-device run of
the same model and prompt."""

import uuid

import numpy as np
import pytest

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def _run(sched, prompt, n=8):
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid,
            input_ids=prompt,
            sampling_params=SamplingParams(
                max_new_tokens=n, temperature=0.0, ignore_eos=True
            ),
        )
    )
    outs, steps = {}, 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 2000
    return outs[rid].output_ids


@pytest.fixture(scope="module")
def long_prompt():
    rng = np.random.default_rng(33)
    # ~10 pages of 16 tokens: exceeds ONE cp=4 rank shard below (3-4 usable pages)
    return rng.integers(3, 250, size=150).tolist()


@pytest.fixture(scope="module")
def baseline(long_prompt):
    sa = tiny_server_args(context_length=512, max_total_tokens=4096)
    sched = Scheduler(sa, tiny_runner(sa))
    return _run(sched, long_prompt)


def test_pool_sharded_cp_exceeds_one_rank_pool(long_prompt, baseline):
    # total pool 16 pages (256 tokens) across cp=4 -> 4 pages/rank
    # (64 tokens). The 150-token prompt CANNOT fit any single rank's
    # shard; striped allocation spreads it across all four.
    sa = tiny_server_args(
        context_length=512,
        max_total_tokens=256,
        attn_cp_size=4,
        attn_cp_mode="pool-sharded",
        max_running_requests=2,
    )
    sched = Scheduler(sa, tiny_runner(sa))
    alloc = sched.allocator
    assert alloc.dp_size == 4
    per_rank_tokens = alloc.pages_per_rank * sched.page_size
    assert len(long_prompt) > per_rank_tokens, "prompt must exceed a shard"
    out = _run(sched, long_prompt)
    assert out == baseline
    assert sched.check_memory() == 0


def test_pool_sharded_striping(long_prompt):
    sa = tiny_server_args(
        context_length=512,
        max_total_tokens=256,
        attn_cp_size=4,
        attn_cp_mode="pool-sharded",
        max_running_requests=2,
    )
    sched = Scheduler(sa, tiny_runner(sa))
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid,
            input_ids=long_prompt,
            sampling_params=SamplingParams(
                max_new_tokens=4, temperature=0.0, ignore_eos=True
            ),
        )
    )
    sched.step()  # prefill
    req = sched.reqs[rid]
    ranks = {sched.allocator.page_rank(p) for p in req.pages}
    assert ranks == {0, 1, 2, 3}, f"pages not striped: {ranks}"
    while sched.has_work():
        sched.step()


def test_pool_sharded_cp_multi_request(baseline, long_prompt):
    """Two concurrent striped requests share the sharded pool."""
    sa = tiny_server_args(
        context_length=512,
        max_total_tokens=1024,
        attn_cp_size=4,
        attn_cp_mode="pool-sharded",
    )
    sched = Scheduler(sa, tiny_runner(sa))
    rng = np.random.default_rng(34)
    short = rng.integers(3, 250, size=21).tolist()
    rids = []
    for p in (long_prompt, short):
        rid = uuid.uuid4().hex
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=rid,
                input_ids=p,
                sampling_params=SamplingParams(
                    max_new_tokens=8, temperature=0.0, ignore_eos=True
                ),
            )
        )
        rids.append(rid)
    outs, steps = {}, 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 2000
    assert outs[rids[0]].output_ids == baseline
    assert len(outs[rids[1]].output_ids) == 8
