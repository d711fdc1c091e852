"""HF-vs-engine logit equivalence.

Parity with the reference's HFRunner/SRTRunner comparison pattern
(`python/sglang/test/runners.py`): the engine's logits on a real (tiny)
checkpoint must match raw HuggingFace transformers within tolerance, for
both prefill (extend) and incremental decode over the paged KV cache.
"""

import numpy as np
import pytest

from tests.test_utils import tiny_server_args

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_hf_checkpoint(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("tiny_llama")
    cfg = LlamaConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        vocab_size=256,
        max_position_embeddings=256,
        rope_theta=10000.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(path)
    return str(path), model


def _make_runner(path, **over):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner

    sa = tiny_server_args(
        model_path=path, load_format="auto", dtype="float32", **over
    )
    mc = ModelConfig.from_server_args(sa)
    return ModelRunner(sa, mc)


def test_prefill_logits_match_hf(tiny_hf_checkpoint):
    path, hf_model = tiny_hf_checkpoint
    runner = _make_runner(path)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 256, size=13).astype(np.int32)

    with torch.no_grad():
        hf_logits = (
            hf_model(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
        )

    ps = runner.page_size
    n_pages = -(-len(prompt) // ps)
    pages = list(range(1, 1 + n_pages))
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))], dtype=np.int32
    )
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, : len(pages)] = pages
    logits = runner.forward_extend_logits(
        prompt,
        np.arange(len(prompt)),
        out_loc,
        pt,
        np.array([len(prompt)]),
        np.array([len(prompt)]),
    )
    np.testing.assert_allclose(logits, hf_logits, atol=2e-3, rtol=2e-3)


def test_decode_logits_match_hf(tiny_hf_checkpoint):
    path, hf_model = tiny_hf_checkpoint
    runner = _make_runner(path)
    from sglang_tpu.sampling.sampling_batch_info import SamplingBatchInfo
    from sglang_tpu.sampling.sampling_params import SamplingParams

    rng = np.random.default_rng(1)
    prompt = rng.integers(0, 256, size=9).astype(np.int32)
    ps = runner.page_size
    pages = [1, 2, 3]
    pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
    pt[0, :3] = pages
    out_loc = np.array(
        [pages[i // ps] * ps + i % ps for i in range(len(prompt))], dtype=np.int32
    )
    sp = SamplingParams(temperature=0.0)
    sinfo = SamplingBatchInfo.from_reqs([sp], padded_bs=runner.extend_seq_bucket)
    nid, _ = runner.forward_extend(
        prompt,
        np.arange(len(prompt)),
        out_loc,
        pt,
        np.array([len(prompt)]),
        np.array([len(prompt)]),
        sinfo,
    )
    ids = list(prompt) + [int(np.asarray(nid)[0])]

    sinfo_d = SamplingBatchInfo.from_reqs([sp], padded_bs=4)
    for _ in range(4):
        pos = len(ids) - 1
        loc = np.array([pages[pos // ps] * ps + pos % ps], dtype=np.int32)
        nid, _ = runner.forward_decode(
            np.array([ids[-1]], dtype=np.int32),
            np.array([pos]),
            loc,
            pt,
            np.array([pos + 1]),
            sinfo_d,
        )
        ids.append(int(np.asarray(nid)[0]))

    # HF greedy continuation from the same prompt must match token-for-token
    with torch.no_grad():
        hf_out = hf_model.generate(
            torch.tensor(prompt[None].astype(np.int64)),
            max_new_tokens=5,
            do_sample=False,
        )[0].numpy()
    assert ids == list(hf_out), (ids, list(hf_out))
