"""CP (attention context parallelism) in the SERVING path (reference
--attn-cp-size, round-robin prefill mode): prefill attention rows split
over the "data" axis; greedy output must equal cp=1 exactly."""

import numpy as np
import pytest

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def _run(sa_over, prompts, max_new=10):
    sa = tiny_server_args(**sa_over)
    sched = Scheduler(sa, tiny_runner(sa))
    for i, ids in enumerate(prompts):
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=f"r{i}",
                input_ids=list(ids),
                sampling_params=SamplingParams(
                    max_new_tokens=max_new, ignore_eos=True, temperature=0.0
                ),
            )
        )
    outs, steps = {}, 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o.output_ids
        steps += 1
        assert steps < 500
    return sched, outs


def test_cp4_matches_cp1_greedy():
    import jax

    if len(jax.devices()) < 4:
        pytest.skip("needs >= 4 virtual devices")
    rng = np.random.default_rng(3)
    prompts = [
        rng.integers(3, 250, size=int(n)).tolist() for n in (5, 23, 41, 11, 33)
    ]
    _, base = _run({}, prompts)
    sched, cp = _run({"attn_cp_size": 4}, prompts)
    assert sched.runner.cp_size == 4
    from sglang_tpu.parallel.cp_attention import CPAttentionBackend

    assert isinstance(sched.runner.attn_backend, CPAttentionBackend)
    assert cp == base
    assert sched.check_memory() == 0


def test_cp_with_tp_composes():
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs >= 8 virtual devices")
    rng = np.random.default_rng(4)
    prompts = [rng.integers(3, 250, size=int(n)).tolist() for n in (7, 29)]
    _, base = _run({}, prompts)
    _, cp_tp = _run({"attn_cp_size": 2, "tp_size": 2}, prompts)
    assert cp_tp == base


def test_cp_conflicts_with_dp_attention():
    with pytest.raises(ValueError, match="conflict"):
        sa = tiny_server_args(
            attn_cp_size=2, dp_size=2, enable_dp_attention=True
        )
        tiny_runner(sa)


def test_cp_in_seq_single_long_prompt_matches_cp1():
    """In-sequence CP: ONE long prompt (several attention q-blocks) at
    cp=4 must match cp=1 exactly — the block-granular ownership split
    (reference --nsa-prefill-cp-mode in-seq analogue)."""
    import jax
    import pytest as _pytest

    if len(jax.devices()) < 4:
        _pytest.skip("needs >= 4 virtual devices")
    rng = np.random.default_rng(9)
    # one prompt spanning multiple EXTEND_QBLK q-blocks + a short one
    prompts = [rng.integers(3, 250, size=120).tolist(),
               rng.integers(3, 250, size=9).tolist()]
    _, base = _run({"prefill_token_buckets": [64, 256]}, prompts)
    sched, cp = _run(
        {"attn_cp_size": 4, "attn_cp_mode": "in-seq",
         "prefill_token_buckets": [64, 256]},
        prompts,
    )
    assert sched.runner.attn_backend.mode == "in-seq"
    assert cp == base
