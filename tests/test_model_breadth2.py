"""HF logit-parity tests for the second model-breadth batch: GPT-2,
GPTBigCode (MQA), Cohere Command-R, Phi-1/2, StableLM, Granite, OLMoE,
Gemma v1 (reference `srt/models/{gpt2,gpt_bigcode,commandr,phi,stablelm,
granite,olmoe,gemma}.py`; HFRunner/SRTRunner parity pattern)."""

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.test_model_breadth import _parity, _save


def test_gpt2_parity(tmp_path_factory):
    from transformers import GPT2Config, GPT2LMHeadModel

    cfg = GPT2Config(
        n_embd=64, n_layer=2, n_head=4, n_positions=256, vocab_size=256,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(10)
    hf = GPT2LMHeadModel(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_gpt2"), seed=10)


def test_gpt_bigcode_parity(tmp_path_factory):
    from transformers import GPTBigCodeConfig, GPTBigCodeForCausalLM

    cfg = GPTBigCodeConfig(
        n_embd=64, n_layer=2, n_head=4, n_positions=256, vocab_size=256,
        multi_query=True, activation_function="gelu_pytorch_tanh",
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(11)
    hf = GPTBigCodeForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_bigcode"), seed=11)


def test_cohere_parity(tmp_path_factory):
    from transformers import CohereConfig, CohereForCausalLM

    cfg = CohereConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        logit_scale=0.0625, use_qk_norm=True, layer_norm_eps=1e-5,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(12)
    hf = CohereForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_cohere"), seed=12)


def test_phi_parity(tmp_path_factory):
    from transformers import PhiConfig, PhiForCausalLM

    cfg = PhiConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        partial_rotary_factor=0.5,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(13)
    hf = PhiForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_phi"), seed=13)


def test_stablelm_parity(tmp_path_factory):
    from transformers import StableLmConfig, StableLmForCausalLM

    cfg = StableLmConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        partial_rotary_factor=0.25, use_qkv_bias=True,
        layer_norm_eps=1e-5, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(14)
    hf = StableLmForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_stablelm"), seed=14)


def test_granite_parity(tmp_path_factory):
    from transformers import GraniteConfig, GraniteForCausalLM

    cfg = GraniteConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.1, logits_scaling=3.0,
        tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(15)
    hf = GraniteForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_granite"), seed=15)


def test_olmoe_parity(tmp_path_factory):
    from transformers import OlmoeConfig, OlmoeForCausalLM

    cfg = OlmoeConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=32, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=False,
        tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(16)
    hf = OlmoeForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_olmoe"), seed=16)


def test_gemma_v1_parity(tmp_path_factory):
    from transformers import GemmaConfig, GemmaForCausalLM

    cfg = GemmaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, head_dim=16, intermediate_size=128,
        vocab_size=256, max_position_embeddings=256, rope_theta=10000.0,
        hidden_activation="gelu_pytorch_tanh",
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(17)
    hf = GemmaForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_gemma1"), seed=17)
