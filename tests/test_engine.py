"""Engine end-to-end tests: text in -> text out, streaming, stop strings.

Parity with the reference's live-server kits run against `Engine`
(`python/sglang/test/kits/*`) — here the engine is in-process so no
subprocess launch is needed (that seam is exercised by the HTTP server
tests instead).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_checkpoint(tmp_path_factory):
    """A tiny llama checkpoint + a word-level tokenizer, all on local disk."""
    from tokenizers import Tokenizer
    from tokenizers.models import WordLevel
    from tokenizers.pre_tokenizers import Whitespace
    from transformers import LlamaConfig, LlamaForCausalLM, PreTrainedTokenizerFast

    path = tmp_path_factory.mktemp("tiny_engine_model")
    vocab = {f"w{i}": i for i in range(250)}
    vocab.update({"<unk>": 250, "<s>": 251, "</s>": 252, "STOPWORD": 253})
    tok = Tokenizer(WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = Whitespace()
    fast = PreTrainedTokenizerFast(
        tokenizer_object=tok,
        unk_token="<unk>",
        bos_token="<s>",
        eos_token="</s>",
    )
    fast.save_pretrained(path)

    cfg = LlamaConfig(
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        intermediate_size=128,
        vocab_size=256,
        max_position_embeddings=512,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        bos_token_id=251,
        eos_token_id=252,
    )
    torch.manual_seed(0)
    LlamaForCausalLM(cfg).eval().save_pretrained(path)
    return str(path)


@pytest.fixture(scope="module")
def engine(tiny_checkpoint):
    from sglang_tpu import Engine

    return Engine(
        model_path=tiny_checkpoint,
        device="cpu",
        page_size=16,
        max_total_tokens=4096,
        context_length=512,
        chunked_prefill_size=128,
        decode_bs_buckets=[4, 8, 16],
        prefill_token_buckets=[64, 128],
        max_running_requests=16,
        random_seed=0,
        log_level="warning",
    )


def test_generate_single(engine):
    out = engine.generate(
        "w1 w2 w3", sampling_params={"max_new_tokens": 6, "temperature": 0.0}
    )
    assert out["meta_info"]["completion_tokens"] == 6
    assert out["meta_info"]["prompt_tokens"] == 3
    assert isinstance(out["text"], str) and out["text"]
    assert out["meta_info"]["finish_reason"]["type"] == "length"


def test_generate_batch(engine):
    prompts = ["w1 w2", "w3 w4 w5 w6", "w7"]
    outs = engine.generate(
        prompts, sampling_params={"max_new_tokens": 4, "temperature": 0.0}
    )
    assert len(outs) == 3
    for o, p in zip(outs, prompts):
        assert o["meta_info"]["prompt_tokens"] == len(p.split())
        assert o["meta_info"]["completion_tokens"] == 4


def test_generate_deterministic_greedy(engine):
    a = engine.generate("w5 w6 w7", sampling_params={"max_new_tokens": 8, "temperature": 0.0})
    b = engine.generate("w5 w6 w7", sampling_params={"max_new_tokens": 8, "temperature": 0.0})
    assert a["output_ids"] == b["output_ids"]
    assert b["meta_info"]["cached_tokens"] >= 0  # prefix reuse on 2nd call


def test_streaming(engine):
    chunks = list(
        engine.generate(
            "w1 w2 w3 w4",
            sampling_params={"max_new_tokens": 12, "temperature": 0.0},
            stream=True,
        )
    )
    assert chunks[-1]["meta_info"]["finish_reason"]["type"] == "length"
    assert len(chunks) >= 2  # at least one interim + the final
    full = engine.generate(
        "w1 w2 w3 w4", sampling_params={"max_new_tokens": 12, "temperature": 0.0}
    )
    assert chunks[-1]["output_ids"] == full["output_ids"]


def test_stop_string(engine):
    # find what greedy decodes, then use its 3rd word as a stop string
    base = engine.generate(
        "w9 w8", sampling_params={"max_new_tokens": 8, "temperature": 0.0}
    )
    words = base["text"].split()
    assert len(words) == 8
    stop = words[2]
    out = engine.generate(
        "w9 w8",
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "stop": stop},
    )
    assert out["meta_info"]["finish_reason"]["type"] == "stop"
    assert stop not in out["text"]
    assert out["meta_info"]["completion_tokens"] <= 4


def test_sampling_with_temperature(engine):
    out = engine.generate(
        "w1 w2",
        sampling_params={
            "max_new_tokens": 6,
            "temperature": 1.0,
            "top_p": 0.9,
            "top_k": 40,
            "ignore_eos": True,
        },
    )
    assert out["meta_info"]["completion_tokens"] == 6


def test_logprobs(engine):
    out = engine.generate(
        "w1 w2 w3",
        sampling_params={"max_new_tokens": 4, "temperature": 0.0},
        return_logprob=True,
    )
    lps = out["meta_info"]["output_token_logprobs"]
    assert len(lps) == 4
    assert all(lp <= 0.0 for lp in lps)


def test_ignore_eos_and_meta(engine):
    out = engine.generate(
        "w1", sampling_params={"max_new_tokens": 5, "temperature": 0.0, "ignore_eos": True}
    )
    assert out["meta_info"]["completion_tokens"] == 5
    info = engine.get_server_info()
    assert info["stats"]["finished"] >= 1


def test_input_embeds_matches_token_ids(engine):
    """input_embeds equal to the embedding rows of a token prompt must
    produce the same greedy output as the token prompt itself."""
    import numpy as np

    eng = engine
    prompt = [5, 9, 13, 21, 2, 7]
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    ref = eng.generate(input_ids=prompt, sampling_params=sp)["output_ids"]
    table = np.asarray(eng.runner.params["embed"], dtype=np.float32)
    embeds = table[np.asarray(prompt)]
    out = eng.generate(input_embeds=embeds, sampling_params=sp)["output_ids"]
    assert out == ref
    # cache isolation: embeds requests must not poison the radix tree
    assert eng.scheduler.check_memory() == 0


def test_async_generate(engine):
    """async_generate (reference Engine.async_generate): awaitable
    results identical to the sync path, streaming async-iterator, and
    sync generate still works after the pump thread starts."""
    import asyncio

    prompt = [7, 11, 13]
    sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
    sync_out = engine.generate(input_ids=prompt, sampling_params=sp)

    async def main():
        single = await engine.async_generate(input_ids=prompt, sampling_params=sp)
        batch = await engine.async_generate(
            input_ids=[prompt, [5, 6]], sampling_params=sp
        )
        chunks = []
        it = await engine.async_generate(
            input_ids=prompt, sampling_params=sp, stream=True
        )
        async for c in it:
            chunks.append(c)
        return single, batch, chunks

    single, batch, chunks = asyncio.run(main())
    assert single["output_ids"] == sync_out["output_ids"]
    assert batch[0]["output_ids"] == sync_out["output_ids"]
    assert len(batch) == 2
    assert chunks[-1]["output_ids"] == sync_out["output_ids"]
    # sync path still serves through the pump thread
    again = engine.generate(input_ids=prompt, sampling_params=sp)
    assert again["output_ids"] == sync_out["output_ids"]
