"""Jump-forward constrained decoding (reference outlines_jump_forward /
jump_forward_cache): grammar-forced character chains are injected without
model forwards, with identical output to plain constrained decoding."""

import re
import uuid

import numpy as np

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_runner, tiny_server_args


class CharTokenizer:
    """1 char = 1 token (id = codepoint); exercises the jump path since
    re-tokenizing any forced string reproduces exact token strings."""

    # matches the tiny llama config's eos_token_id so grammar-EOS and
    # model-EOS agree (as with real tokenizers)
    eos_token_id = 2
    all_special_ids = [2]

    def get_vocab(self):
        return {chr(i): i for i in range(1, 256)}

    def __len__(self):
        return 256

    def encode(self, s, add_special_tokens=False):
        return [ord(c) for c in s if ord(c) < 256]

    def decode(self, ids, **kw):
        return "".join(chr(i) for i in ids if 0 < i < 256 and i != 2)

    def convert_ids_to_tokens(self, ids):
        return [chr(i) for i in ids]

    def convert_tokens_to_string(self, toks):
        return "".join(toks)


def _run(regex, jump_min=None, n=24, seed=0, temp=0.7):
    sa = tiny_server_args(random_seed=seed)
    sched = Scheduler(sa, tiny_runner(sa), tokenizer=CharTokenizer())
    if jump_min is not None:
        sched.JUMP_FORWARD_MIN_CHARS = jump_min
    rid = uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=rid,
            input_ids=[ord("x"), ord("y"), ord("z")],
            sampling_params=SamplingParams(
                max_new_tokens=n, temperature=temp, regex=regex, ignore_eos=False
            ),
        )
    )
    outs, steps = {}, 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 500
    return outs[rid], sched


def test_jump_forward_injects_forced_chain():
    # after two digits the grammar forces "-code-" (6 chars), then 2 digits
    regex = r"[0-9]{2}-code-[0-9]{2}"
    out, sched = _run(regex)
    text = "".join(chr(i) for i in out.output_ids if i != 2)
    assert re.fullmatch(regex, text), text
    assert sched.stats.num_jump_forward_tokens >= 6
    assert sched.check_memory() == 0


def test_jump_forward_output_identical_to_plain():
    """Same seed with jumping disabled must give the same tokens (char
    tokenizer: the forced chain is what sampling would pick anyway)."""
    regex = r"ab[0-9]prefixed[0-9]cd"
    jumped, s1 = _run(regex, seed=3, temp=0.0)  # greedy: rng-stream free
    plain, s2 = _run(regex, jump_min=10**9, seed=3, temp=0.0)
    assert jumped.output_ids == plain.output_ids
    assert s1.stats.num_jump_forward_tokens > 0
    assert s2.stats.num_jump_forward_tokens == 0
    # the jump skipped model forwards
    assert s1.stats.num_decode_steps < s2.stats.num_decode_steps


def test_jump_forward_mixed_batch_unaffected():
    """A free request sharing the batch with a jumping grammar request is
    untouched."""
    sa = tiny_server_args(random_seed=1)
    sched = Scheduler(sa, tiny_runner(sa), tokenizer=CharTokenizer())
    free_rid, gram_rid = uuid.uuid4().hex, uuid.uuid4().hex
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=free_rid, input_ids=[5, 6, 7],
            sampling_params=SamplingParams(
                max_new_tokens=12, temperature=0.0, ignore_eos=True
            ),
        )
    )
    sched.add_request(
        TokenizedGenerateReqInput(
            rid=gram_rid, input_ids=[ord("q")],
            sampling_params=SamplingParams(
                max_new_tokens=20, temperature=0.5,
                regex=r"[0-9]forced[0-9]", ignore_eos=False,
            ),
        )
    )
    outs, steps = {}, 0
    while sched.has_work():
        for o in sched.step():
            if o.finished:
                outs[o.rid] = o
        steps += 1
        assert steps < 500
    # baseline: free request alone, same seed
    sa2 = tiny_server_args(random_seed=1)
    sched2 = Scheduler(sa2, tiny_runner(sa2), tokenizer=CharTokenizer())
    sched2.add_request(
        TokenizedGenerateReqInput(
            rid="solo", input_ids=[5, 6, 7],
            sampling_params=SamplingParams(
                max_new_tokens=12, temperature=0.0, ignore_eos=True
            ),
        )
    )
    solo = {}
    while sched2.has_work():
        for o in sched2.step():
            if o.finished:
                solo[o.rid] = o
    assert outs[free_rid].output_ids == solo["solo"].output_ids
    text = "".join(chr(i) for i in outs[gram_rid].output_ids if i != 2)
    assert re.fullmatch(r"[0-9]forced[0-9]", text), text
    assert sched.check_memory() == 0
