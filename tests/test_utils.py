"""Shared test fixtures/helpers.

Parity with reference `python/sglang/test/test_utils.py` (tiny pinned model
configs, runner helpers). The tiny llama config keeps CPU compiles fast.
"""

from __future__ import annotations

import numpy as np

from sglang_tpu.configs.model_config import ModelConfig
from sglang_tpu.server_args import ServerArgs

TINY_LLAMA_HF = dict(
    architectures=["LlamaForCausalLM"],
    model_type="llama",
    hidden_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    intermediate_size=128,
    vocab_size=256,
    max_position_embeddings=256,
    rms_norm_eps=1e-6,
    rope_theta=10000.0,
    tie_word_embeddings=True,
    bos_token_id=1,
    eos_token_id=2,
)


def tiny_model_config(**over) -> ModelConfig:
    hf = dict(TINY_LLAMA_HF)
    hf.update(over.pop("hf_over", {}))
    return ModelConfig.from_hf_dict(hf, model_path="tiny-test", **over)


def tiny_runner(sa: ServerArgs, **cfg_over):
    """ModelRunner over the in-memory tiny config (no network/hub access)."""
    from sglang_tpu.model_executor.model_runner import ModelRunner

    mc = tiny_model_config(
        dtype=sa.dtype,
        context_length=sa.context_length,
        quantization=sa.quantization,
        kv_cache_dtype=sa.kv_cache_dtype,
        **cfg_over,
    )
    return ModelRunner(sa, mc)


def tiny_server_args(**over) -> ServerArgs:
    kw = dict(
        model_path="tiny-test",
        load_format="dummy",
        max_total_tokens=2048,
        page_size=16,
        context_length=256,
        chunked_prefill_size=128,
        decode_bs_buckets=[4, 8, 16],
        prefill_token_buckets=[64, 128],
        max_running_requests=16,
        device="cpu",
        random_seed=0,
        skip_tokenizer_init=True,
    )
    kw.update(over)
    return ServerArgs(**kw)
