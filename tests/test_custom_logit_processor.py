"""Custom logit processors (reference custom_logit_processor sampling
param): named jittable fns registered at launch, selected per request
with per-request params, applied inside the jitted sample step."""

import uuid

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


def force_token(logits, params):
    """Force the token id given in params[:, 0] (prob 1)."""
    tid = params[:, 0].astype(jnp.int32)
    b, v = logits.shape
    onehot = jnp.arange(v)[None, :] == tid[:, None]
    return jnp.where(onehot, 0.0, -1e30)


def ban_token(logits, params):
    """Ban the token id given in params[:, 0]."""
    tid = params[:, 0].astype(jnp.int32)
    b, v = logits.shape
    onehot = jnp.arange(v)[None, :] == tid[:, None]
    return jnp.where(onehot, -1e30, logits)


PROCS = [
    "force=tests.test_custom_logit_processor:force_token",
    "ban=tests.test_custom_logit_processor:ban_token",
]


def _sched(**over):
    sa = tiny_server_args(custom_logit_processors=PROCS, **over)
    return Scheduler(sa, tiny_runner(sa))


def _submit(sched, ids, n=8, **sp):
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid, input_ids=list(ids),
            sampling_params=SamplingParams(
                max_new_tokens=n, temperature=0.0, ignore_eos=True, **sp
            ),
        )
    )
    return rid


def _drain(sched):
    outs, steps = {}, 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 400
    return outs


def test_force_processor_controls_output():
    sched = _sched()
    rid = _submit(
        sched, [5, 6, 7],
        custom_logit_processor="force", custom_params=[42.0],
    )
    out = _drain(sched)[rid]
    assert out.output_ids == [42] * 8


def test_mixed_batch_per_row_dispatch():
    """Three requests: force(42), ban(top token), and no processor — each
    row gets its own treatment in ONE batch."""
    sched = _sched()
    plain_sched = _sched()
    prompt = [9, 10, 11]
    r_plain_solo = _submit(plain_sched, prompt)
    base = _drain(plain_sched)[r_plain_solo].output_ids

    r_force = _submit(
        sched, prompt, custom_logit_processor="force", custom_params=[7.0]
    )
    r_ban = _submit(
        sched, prompt,
        custom_logit_processor="ban", custom_params=[float(base[0])],
    )
    r_plain = _submit(sched, prompt)
    outs = _drain(sched)
    assert outs[r_force].output_ids == [7] * 8
    assert outs[r_ban].output_ids[0] != base[0]  # banned greedy winner
    assert outs[r_plain].output_ids == base  # untouched row identical
    assert sched.check_memory() == 0


def test_unknown_processor_rejected():
    sched = _sched()
    with pytest.raises(ValueError, match="unknown custom_logit_processor"):
        _submit(sched, [1, 2], custom_logit_processor="nope")


def test_multi_step_decode_with_processor():
    """Custom procs ride the fused multi-step decode path (packed sinfo
    blobs must carry proc fields)."""
    sched = _sched(decode_multi_step=4)
    rid = _submit(
        sched, [3, 4], n=10,
        custom_logit_processor="force", custom_params=[33.0],
    )
    out = _drain(sched)[rid]
    assert out.output_ids == [33] * 10
    assert sched.check_memory() == 0
