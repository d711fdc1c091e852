"""GPT-OSS parity vs HF (attention sinks + sliding layers + biased MoE +
YaRN rope) — reference `models/gpt_oss.py` coverage."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def test_gpt_oss_logits_match_hf(tmp_path_factory):
    from transformers import GptOssConfig, GptOssForCausalLM

    path = tmp_path_factory.mktemp("tiny_gptoss")
    cfg = GptOssConfig(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=32,
        num_local_experts=4, num_experts_per_tok=2, vocab_size=256,
        max_position_embeddings=512, sliding_window=16,
        tie_word_embeddings=True,
        rope_scaling={"rope_type": "yarn", "factor": 8.0, "beta_fast": 32.0,
                      "beta_slow": 1.0, "truncate": False,
                      "original_max_position_embeddings": 64},
    )
    torch.manual_seed(0)
    model = GptOssForCausalLM(cfg).eval()
    model.save_pretrained(path)

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=str(path), load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(0)
    # cross the sliding window to exercise both layer types
    prompt = rng.integers(0, 250, size=30).astype(np.int32)
    with torch.no_grad():
        hf_logits = (
            model(torch.tensor(prompt[None].astype(np.int64))).logits[0].numpy()
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
        prompt, np.arange(len(prompt)), out_loc, pt,
        np.array([len(prompt)]), np.array([len(prompt)]),
    )
    np.testing.assert_allclose(logits, hf_logits, atol=6e-3, rtol=6e-3)


def test_gpt_oss_greedy_decode(tmp_path_factory):
    from transformers import GptOssConfig, GptOssForCausalLM

    path = tmp_path_factory.mktemp("tiny_gptoss_gen")
    cfg = GptOssConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=32,
        num_local_experts=4, num_experts_per_tok=2, vocab_size=256,
        max_position_embeddings=512, sliding_window=8,
        tie_word_embeddings=True, rope_scaling=None,
    )
    torch.manual_seed(1)
    hf = GptOssForCausalLM(cfg).eval()
    hf.save_pretrained(path)

    from sglang_tpu.entrypoints.engine import Engine
    from sglang_tpu.server_args import ServerArgs

    eng = Engine(
        ServerArgs(
            model_path=str(path), dtype="float32", device="cpu", page_size=16,
            context_length=256, max_total_tokens=2048,
            prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
            max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
            log_level="warning",
        )
    )
    prompt = [int(x) for x in np.random.default_rng(4).integers(3, 250, size=12)]
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
    )
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0].tolist()
    assert out["output_ids"] == ref[len(prompt):]
