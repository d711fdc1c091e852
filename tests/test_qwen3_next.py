"""Qwen3-Next hybrid linear-attention (Gated DeltaNet) tests: HF logit +
greedy-generation parity, chunked prefill state carry, and multi-request
serving through the scheduler (reference hybrid_linear_attn_backend +
`srt/models/qwen3_next.py`; A8/K9/M5 capability axis)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_server_args


def _make_hf(num_experts=0, layers=4):
    from transformers.models.qwen3_next import (
        Qwen3NextConfig,
        Qwen3NextForCausalLM,
    )

    kw = dict(
        hidden_size=64,
        num_hidden_layers=layers,
        layer_types=[
            "full_attention" if (i + 1) % 2 == 0 else "linear_attention"
            for i in range(layers)
        ],
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=96,
        vocab_size=256,
        max_position_embeddings=256,
        partial_rotary_factor=0.25,
        linear_num_key_heads=2,
        linear_num_value_heads=4,
        linear_key_head_dim=16,
        linear_value_head_dim=16,
        linear_conv_kernel_dim=4,
        rms_norm_eps=1e-6,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        num_experts=num_experts,
        bos_token_id=1,
        eos_token_id=2,
    )
    if num_experts:
        kw.update(
            num_experts_per_tok=2,
            decoder_sparse_step=1,
            moe_intermediate_size=32,
            shared_expert_intermediate_size=32,
            norm_topk_prob=True,
            mlp_only_layers=[],
        )
    cfg = Qwen3NextConfig(**kw)
    torch.manual_seed(0)
    return Qwen3NextForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def dense_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_qwen3_next")
    model = _make_hf(num_experts=0)
    model.save_pretrained(path)
    return str(path), model


@pytest.fixture(scope="module")
def moe_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_qwen3_next_moe")
    model = _make_hf(num_experts=4)
    model.save_pretrained(path)
    return str(path), model


def _runner(path):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner

    sa = tiny_server_args(model_path=path, load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    return sa, ModelRunner(sa, mc)


def _prefill_logits(runner, prompt):
    ps = runner.page_size
    n_pages = -(-len(prompt) // ps)
    pages = list(range(1, 1 + n_pages))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))],
        dtype=np.int32,
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    return runner.forward_extend_logits(
        prompt,
        np.arange(len(prompt)),
        out_loc,
        pt,
        np.array([len(prompt)]),
        np.array([len(prompt)]),
    )


def test_prefill_logits_match_hf(dense_ckpt):
    path, hf = dense_ckpt
    _, runner = _runner(path)
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 256, size=13).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
    got = _prefill_logits(runner, prompt)
    np.testing.assert_allclose(got, want, atol=4e-3, rtol=4e-3)


def test_moe_prefill_logits_match_hf(moe_ckpt):
    path, hf = moe_ckpt
    _, runner = _runner(path)
    rng = np.random.default_rng(1)
    prompt = rng.integers(3, 256, size=9).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
    got = _prefill_logits(runner, prompt)
    np.testing.assert_allclose(got, want, atol=5e-3, rtol=5e-3)


def _hf_greedy(hf, prompt, n):
    with torch.no_grad():
        out = hf.generate(
            torch.tensor(np.asarray(prompt)[None].astype(np.int64)),
            max_new_tokens=n,
            do_sample=False,
        )
    return out[0][len(prompt):].tolist()


def _sched_run(sa, runner, prompts, max_new=8):
    sched = Scheduler(sa, runner)
    assert sched.is_hybrid and sched.radix_cache.disable
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
    return outs


def test_generation_matches_hf_multi_request(dense_ckpt):
    path, hf = dense_ckpt
    sa, runner = _runner(path)
    rng = np.random.default_rng(2)
    prompts = [
        rng.integers(3, 256, size=int(n)).tolist() for n in (5, 17, 11)
    ]
    outs = _sched_run(sa, runner, prompts, max_new=8)
    for i, p in enumerate(prompts):
        assert outs[f"r{i}"] == _hf_greedy(hf, p, 8), i


def test_chunked_prefill_state_carry(dense_ckpt):
    # prompt longer than chunked_prefill_size: the GDN conv + delta-rule
    # state must carry between chunks for output to match HF
    path, hf = dense_ckpt
    sa, runner = _runner(path)
    sa.chunked_prefill_size = 32
    sa.max_prefill_tokens = 32
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 256, size=71).tolist()
    outs = _sched_run(sa, runner, [prompt], max_new=6)
    assert outs["r0"] == _hf_greedy(hf, prompt, 6)
