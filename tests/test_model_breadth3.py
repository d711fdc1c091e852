"""HF logit-parity tests for the third model-breadth batch: OLMo-1,
SmolLM3 (NoPE interleave), Arcee (relu^2), GPT-NeoX (parallel residual,
fused per-head QKV), Nemotron (LayerNorm1P), GLM-4 ("glm" partial
interleaved rotary), Persimmon (qk-LN, relu^2), Falcon (classic MQA
parallel-attn AND new decoder architecture)."""

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.test_model_breadth import _parity, _save


def test_olmo_parity(tmp_path_factory):
    from transformers import OlmoConfig, OlmoForCausalLM

    cfg = OlmoConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0, clip_qkv=8.0,
        tie_word_embeddings=True, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(30)
    hf = OlmoForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_olmo"), seed=30)


def test_smollm3_parity(tmp_path_factory):
    from transformers import SmolLM3Config, SmolLM3ForCausalLM

    cfg = SmolLM3Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        no_rope_layer_interval=2, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(31)
    hf = SmolLM3ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_smollm3"), seed=31)


def test_arcee_parity(tmp_path_factory):
    from transformers import ArceeConfig, ArceeForCausalLM

    cfg = ArceeConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        tie_word_embeddings=True, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(32)
    hf = ArceeForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_arcee"), seed=32)


@pytest.mark.parametrize("parallel", [True, False])
def test_gpt_neox_parity(tmp_path_factory, parallel):
    from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

    cfg = GPTNeoXConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rotary_pct=0.25,
        use_parallel_residual=parallel, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(33)
    hf = GPTNeoXForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_neox"), seed=33)


def test_nemotron_parity(tmp_path_factory):
    from transformers import NemotronConfig, NemotronForCausalLM

    cfg = NemotronConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        partial_rotary_factor=0.5, norm_eps=1e-5,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(34)
    hf = NemotronForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_nemotron"), seed=34)


def test_glm_parity(tmp_path_factory):
    from transformers import GlmConfig, GlmForCausalLM

    cfg = GlmConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        partial_rotary_factor=0.5, attention_bias=True,
        tie_word_embeddings=True, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(35)
    hf = GlmForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_glm"), seed=35)


def test_persimmon_parity(tmp_path_factory):
    from transformers import PersimmonConfig, PersimmonForCausalLM

    cfg = PersimmonConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        partial_rotary_factor=0.5, qk_layernorm=True,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(36)
    hf = PersimmonForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_persimmon"), seed=36)


def test_falcon_classic_mqa_parity(tmp_path_factory):
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        vocab_size=256, new_decoder_architecture=False, multi_query=True,
        parallel_attn=True, alibi=False, bias=False, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(37)
    hf = FalconForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_falcon7b"), seed=37)


def test_falcon_new_arch_parity(tmp_path_factory):
    from transformers import FalconConfig, FalconForCausalLM

    cfg = FalconConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_kv_heads=2, vocab_size=256, new_decoder_architecture=True,
        alibi=False, bias=False, rope_theta=10000.0,
        max_position_embeddings=256, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2,
    )
    torch.manual_seed(38)
    hf = FalconForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_falcon40b"), seed=38)
