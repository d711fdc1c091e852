"""STANDALONE draft-model speculative decoding (reference S4): output must
be IDENTICAL to plain target greedy decoding — with a perfect draft (same
weights) acceptance is high, with a mismatched draft it still never changes
the output."""

import uuid

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def checkpoints(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    paths = []
    for seed in (0, 3):
        p = tmp_path_factory.mktemp(f"spec_ckpt{seed}")
        torch.manual_seed(seed)
        LlamaForCausalLM(cfg).eval().save_pretrained(p)
        paths.append(str(p))
    return paths


def _run(target, draft_path=None, prompts=None, n=20):
    from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
    from sglang_tpu.managers.scheduler import Scheduler
    from sglang_tpu.sampling.sampling_params import SamplingParams
    from sglang_tpu.server_args import ServerArgs

    sa = ServerArgs(
        model_path=target, dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
        speculative_algorithm="STANDALONE" if draft_path else None,
        speculative_draft_model_path=draft_path,
        speculative_num_draft_tokens=4,
    )
    sched = Scheduler(sa)
    rids = []
    for p in prompts:
        rid = uuid.uuid4().hex
        sched.add_request(
            TokenizedGenerateReqInput(
                rid=rid, input_ids=p,
                sampling_params=SamplingParams(
                    max_new_tokens=n, temperature=0.0, ignore_eos=True
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
        assert steps < 600
    return [outs[r].output_ids for r in rids], sched


def test_perfect_draft_accelerates(checkpoints):
    target = checkpoints[0]
    rng = np.random.default_rng(0)
    prompts = [rng.integers(3, 250, size=m).tolist() for m in (7, 19)]
    base, sched_base = _run(target, None, prompts)
    spec, sched_spec = _run(target, target, prompts)  # draft == target
    assert spec == base
    # perfect draft: fewer target decode rounds than tokens generated
    assert sched_spec.stats.num_decode_steps < sched_base.stats.num_decode_steps
    assert sched_spec.check_memory() == 0


def test_mismatched_draft_is_lossless(checkpoints):
    target, draft = checkpoints
    rng = np.random.default_rng(1)
    prompts = [rng.integers(3, 250, size=m).tolist() for m in (9, 25)]
    base, _ = _run(target, None, prompts)
    spec, sched = _run(target, draft, prompts)
    assert spec == base  # a bad draft may be slow, never wrong
    assert sched.check_memory() == 0
