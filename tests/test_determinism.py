"""Deterministic-inference guarantees (reference
`test/registered/core/test_deterministic.py` + batch_invariant_ops):
same-request determinism across runs, batch-size invariance (a request's
greedy output must not depend on its batchmates), and abort robustness."""

import uuid

import numpy as np

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def submit(sched, ids, n=10, **sp):
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid,
            input_ids=list(ids),
            sampling_params=SamplingParams(
                max_new_tokens=n, temperature=0.0, ignore_eos=True, **sp
            ),
        )
    )
    return rid


def drain(sched, cap=1000):
    outs = {}
    steps = 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < cap
    return outs


def test_batch_size_invariance():
    """Greedy output of a prompt alone == in a mixed batch (the reference
    dedicates batch-invariant kernels to this; our per-row attention and
    row-wise matmuls give it structurally)."""
    sa = tiny_server_args()
    sched = Scheduler(sa, tiny_runner(sa))
    rng = np.random.default_rng(0)
    probe = rng.integers(3, 250, size=21).tolist()

    rid_alone = submit(sched, probe)
    alone = drain(sched, 500)[rid_alone]
    # re-run with 5 batchmates of varying lengths
    rid = submit(sched, probe)
    for n in (5, 17, 30, 9, 44):
        submit(sched, rng.integers(3, 250, size=n).tolist(), n=6)
    batched = drain(sched)[rid]
    assert alone.output_ids == batched.output_ids


def test_rerun_determinism_with_sampling():
    sa = tiny_server_args(random_seed=7)
    prompts = [np.random.default_rng(i).integers(3, 250, size=9).tolist() for i in range(3)]

    def run():
        sched = Scheduler(sa, tiny_runner(sa))
        rids = [
            submit(sched, p, n=8, top_p=0.9) for p in prompts
        ]
        outs = drain(sched)
        return [outs[r].output_ids for r in rids]

    assert run() == run()


def test_abort_mid_decode():
    sa = tiny_server_args()
    sched = Scheduler(sa, tiny_runner(sa))
    rid_victim = submit(sched, [5, 6, 7], n=50)
    rid_other = submit(sched, [8, 9], n=12)
    outs = {}
    steps = 0
    aborted = False
    while sched.has_work():
        if steps == 4 and not aborted:
            sched.abort_request(rid_victim)
            aborted = True
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 300
    assert rid_other in outs
    assert len(outs[rid_other].output_ids) == 12
    if rid_victim in outs:  # abort notification carries the abort reason
        assert outs[rid_victim].finish_reason.kind == "abort"
    assert sched.check_memory() == 0
