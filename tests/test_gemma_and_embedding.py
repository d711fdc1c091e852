"""Gemma2 HF logit parity + Engine.encode embeddings."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def tiny_gemma2(tmp_path_factory):
    from transformers import Gemma2Config, Gemma2ForCausalLM

    path = tmp_path_factory.mktemp("tiny_gemma2")
    cfg = Gemma2Config(
        hidden_size=64,
        num_hidden_layers=4,  # even: 2 sliding + 2 global
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=128,
        vocab_size=256,
        max_position_embeddings=256,
        sliding_window=16,
        query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
    )
    torch.manual_seed(0)
    model = Gemma2ForCausalLM(cfg).eval()
    model.save_pretrained(path)
    return str(path), model


def test_gemma2_logits_match_hf(tiny_gemma2):
    path, hf_model = tiny_gemma2
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=path, load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(0)
    # longer than the sliding window to exercise windowed layers
    prompt = rng.integers(0, 256, size=30).astype(np.int32)
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
    np.testing.assert_allclose(logits, hf_logits, atol=5e-3, rtol=5e-3)


def test_engine_encode(tmp_path_factory):
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    path = tmp_path_factory.mktemp("embed_model")
    vocab = {f"w{i}": i for i in range(250)}
    vocab.update({"<unk>": 250, "<s>": 251, "</s>": 252})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="<unk>", bos_token="<s>", eos_token="</s>"
    ).save_pretrained(path)
    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval()
    hf.save_pretrained(path)

    from sglang_tpu import Engine

    eng = Engine(
        model_path=str(path), device="cpu", dtype="float32", page_size=16,
        max_total_tokens=2048, context_length=256, decode_bs_buckets=[4, 8],
        prefill_token_buckets=[64, 128], max_running_requests=8,
        random_seed=0, log_level="warning",
    )
    outs = eng.encode(["w1 w2 w3", "w4 w5"])
    assert len(outs) == 2
    assert len(outs[0]["embedding"]) == 64
    assert outs[0]["meta_info"]["prompt_tokens"] == 3

    # last-token pooled hidden must match HF last_hidden_state @ final norm
    with torch.no_grad():
        hf_h = hf.model(torch.tensor([[1, 2, 3]])).last_hidden_state[0, -1].numpy()
    ours = np.array(eng.encode(input_ids=[1, 2, 3])["embedding"])
    np.testing.assert_allclose(ours, hf_h, atol=2e-3, rtol=2e-3)
    # no page leaks
    assert eng.scheduler.check_memory() == 0
