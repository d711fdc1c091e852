"""Plugin loading (reference plugin/entry-point extension): external
modules register models and tool parsers through a stable api."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

# --- a plugin module defined in this test package -------------------------

REGISTERED = {}


def register(api):
    from sglang_tpu.models.llama import LlamaForCausalLM

    class MyOrgModel(LlamaForCausalLM):
        architectures = ["MyOrgForCausalLM"]

    from sglang_tpu.parser.function_call import HermesDetector

    api.register_model(MyOrgModel)
    api.register_tool_parser("myorg", HermesDetector)
    REGISTERED["args"] = api.server_args


def test_plugin_via_engine(tmp_path, monkeypatch):
    from transformers import LlamaConfig, LlamaForCausalLM

    cfg = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
        architectures=["MyOrgForCausalLM"],
    )
    torch.manual_seed(0)
    hf = LlamaForCausalLM(cfg).eval()
    hf.save_pretrained(tmp_path)
    # force the custom architecture name into the saved config
    import json, os

    with open(tmp_path / "config.json") as f:
        d = json.load(f)
    d["architectures"] = ["MyOrgForCausalLM"]
    with open(tmp_path / "config.json", "w") as f:
        json.dump(d, f)

    from sglang_tpu import Engine

    # without the plugin the architecture is unknown
    with pytest.raises(ValueError, match="no registered model"):
        Engine(
            model_path=str(tmp_path), dtype="float32", device="cpu",
            page_size=16, context_length=256, max_total_tokens=1024,
            prefill_token_buckets=[64], decode_bs_buckets=[4],
            max_running_requests=4, skip_tokenizer_init=True,
            random_seed=0, log_level="warning",
        )

    eng = Engine(
        model_path=str(tmp_path), dtype="float32", device="cpu",
        page_size=16, context_length=256, max_total_tokens=1024,
        prefill_token_buckets=[64], decode_bs_buckets=[4],
        max_running_requests=4, skip_tokenizer_init=True,
        random_seed=0, log_level="warning",
        plugins=["tests.test_plugins"],
    )
    assert eng.plugins.loaded == ["tests.test_plugins"]
    assert REGISTERED["args"].model_path == str(tmp_path)
    # the plugin-registered architecture serves and matches HF greedy
    prompt = np.random.default_rng(0).integers(3, 250, size=7).tolist()
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 6, "temperature": 0.0,
                         "ignore_eos": True},
    )
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=6, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        )[0, 7:].tolist()
    assert out["output_ids"] == ref
    # tool parser registered
    from sglang_tpu.parser.function_call import DETECTORS

    assert "myorg" in DETECTORS
    eng.shutdown()
