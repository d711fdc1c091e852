"""Mamba2 (pure SSD) tests: HF logit + greedy parity, chunked-prefill state
carry, multi-request serving (reference `srt/layers/attention/mamba/` +
`MambaPool`, `memory_pool.py:195`; K9/A8 capability axis). Every layer is
recurrent — no paged KV is read at all."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from sglang_tpu.managers.io_struct import TokenizedGenerateReqInput
from sglang_tpu.managers.scheduler import Scheduler
from sglang_tpu.sampling.sampling_params import SamplingParams
from tests.test_utils import tiny_server_args


def _make_hf(layers=3):
    from transformers import Mamba2Config, Mamba2ForCausalLM

    cfg = Mamba2Config(
        hidden_size=64,
        num_hidden_layers=layers,
        state_size=16,
        head_dim=8,
        num_heads=16,  # expand*hidden/head_dim = 2*64/8
        expand=2,
        n_groups=2,
        conv_kernel=4,
        use_conv_bias=True,
        use_bias=False,
        vocab_size=256,
        tie_word_embeddings=False,
        layer_norm_epsilon=1e-5,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(0)
    return Mamba2ForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_mamba2")
    model = _make_hf()
    model.save_pretrained(path)
    return str(path), model


def _runner(path):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner

    sa = tiny_server_args(model_path=path, load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    return sa, ModelRunner(sa, mc)


def test_prefill_logits_match_hf(ckpt):
    path, hf = ckpt
    _, runner = _runner(path)
    assert runner.model.kv_kinds == ["linear"] * 3
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 256, size=13).astype(np.int32)
    with torch.no_grad():
        want = hf(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
    ps = runner.page_size
    n_pages = -(-len(prompt) // ps)
    pages = list(range(1, 1 + n_pages))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))],
        dtype=np.int32,
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    got = runner.forward_extend_logits(
        prompt, np.arange(len(prompt)), out_loc, pt,
        np.array([len(prompt)]), np.array([len(prompt)]),
    )
    np.testing.assert_allclose(got, want, atol=4e-3, rtol=4e-3)


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


def test_generation_matches_hf_multi_request(ckpt):
    path, hf = ckpt
    sa, runner = _runner(path)
    rng = np.random.default_rng(2)
    prompts = [rng.integers(3, 256, size=int(n)).tolist() for n in (5, 17, 11)]
    outs = _sched_run(sa, runner, prompts, max_new=8)
    for i, p in enumerate(prompts):
        assert outs[f"r{i}"] == _hf_greedy(hf, p, 8), i


def test_chunked_prefill_state_carry(ckpt):
    path, hf = ckpt
    sa, runner = _runner(path)
    sa.chunked_prefill_size = 32
    sa.max_prefill_tokens = 32
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 256, size=71).tolist()
    outs = _sched_run(sa, runner, [prompt], max_new=6)
    assert outs["r0"] == _hf_greedy(hf, prompt, 6)


# ---------------------------------------------------------------- Bamba

def _make_bamba():
    from transformers import BambaConfig, BambaForCausalLM

    cfg = BambaConfig(
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=96,
        vocab_size=256,
        mamba_n_heads=16,
        mamba_d_head=8,
        mamba_d_state=16,
        mamba_n_groups=2,
        mamba_expand=2,
        mamba_d_conv=4,
        attn_layer_indices=[1, 3],
        tie_word_embeddings=False,
        rms_norm_eps=1e-5,
    )
    torch.manual_seed(1)
    return BambaForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def bamba_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_bamba")
    model = _make_bamba()
    model.save_pretrained(path)
    return str(path), model


def test_bamba_hybrid_generation_matches_hf(bamba_ckpt):
    """Interleaved mamba/attention layers: paged KV on attention layers,
    slot state pools on mamba layers, outputs == HF greedy."""
    path, hf = bamba_ckpt
    sa, runner = _runner(path)
    assert runner.model.kv_kinds == ["linear", "paged", "linear", "paged"]
    rng = np.random.default_rng(5)
    prompts = [rng.integers(3, 256, size=int(n)).tolist() for n in (7, 19, 12)]
    outs = _sched_run(sa, runner, prompts, max_new=8)
    for i, p in enumerate(prompts):
        assert outs[f"r{i}"] == _hf_greedy(hf, p, 8), i


def test_bamba_chunked_prefill_state_carry(bamba_ckpt):
    path, hf = bamba_ckpt
    sa, runner = _runner(path)
    sa.chunked_prefill_size = 32
    sa.max_prefill_tokens = 32
    rng = np.random.default_rng(6)
    prompt = rng.integers(3, 256, size=55).tolist()
    outs = _sched_run(sa, runner, [prompt], max_new=6)
    assert outs["r0"] == _hf_greedy(hf, prompt, 6)
