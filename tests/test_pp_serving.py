"""Pipeline parallelism wired into the SERVING path (reference
`scheduler_pp_mixin.py` + `--pp-size`): tokens flow through the real
Scheduler/ModelRunner with layers and the paged KV pool stack-sharded over
the "pipe" mesh axis. Output must be bit-identical to pp=1 on the same
requests — prefill, chunked prefill, multi-step decode, and sampling all
run through the GPipe shard_map."""

import uuid

import numpy as np
import pytest

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def _run(sa_over, prompts, max_new=12, temperature=0.0):
    hf_over = sa_over.pop("hf_over", {})
    sa = tiny_server_args(**sa_over)
    sched = Scheduler(sa, tiny_runner(sa, hf_over=hf_over))
    for i, ids in enumerate(prompts):
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=f"r{i}",
                input_ids=list(ids),
                sampling_params=SamplingParams(
                    max_new_tokens=max_new,
                    ignore_eos=True,
                    temperature=temperature,
                ),
            )
        )
    outs = {}
    steps = 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o.output_ids
        steps += 1
        assert steps < 500
    return outs


def _prompts(n=5, lo=3, hi=40):
    rng = np.random.default_rng(0)
    return [
        rng.integers(3, 250, size=int(rng.integers(lo, hi))).tolist()
        for _ in range(n)
    ]


def test_pp2_matches_pp1_greedy():
    prompts = _prompts()
    base = _run({}, prompts)
    pp = _run({"pp_size": 2}, prompts)
    assert base == pp


def test_pp2_tp2_matches_pp1():
    prompts = _prompts(4)
    base = _run({}, prompts)
    pp = _run({"pp_size": 2, "tp_size": 2}, prompts)
    assert base == pp


def test_pp2_four_layers_microbatched_decode():
    # 4 layers -> 2 per stage; decode buckets divisible by M=2 exercises
    # the row-microbatched GPipe schedule
    hf = {"num_hidden_layers": 4}
    prompts = _prompts(6)
    base = _run({"hf_over": dict(hf)}, prompts)
    pp = _run({"hf_over": dict(hf), "pp_size": 2}, prompts)
    assert base == pp


def test_pp2_sampled_determinism():
    # the pipelined forward reassociates bf16 math (scan vs unrolled loop),
    # so sampled streams can differ from pp=1 at temperature > 0 — but the
    # pp run itself must be seed-deterministic (sampling is replicated over
    # "pipe": every stage folds the same rng)
    prompts = _prompts(3)
    a = _run({"pp_size": 2}, prompts, temperature=0.8)
    b = _run({"pp_size": 2}, prompts, temperature=0.8)
    assert a == b
    assert all(len(v) == 12 for v in a.values())


def test_pp_rejects_indivisible_layers():
    with pytest.raises(ValueError):
        _run({"pp_size": 3}, _prompts(1))
