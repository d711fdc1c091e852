"""HF logit-parity tests for the sixth model-breadth batch: OPT
(learned positions), GPT-J (single-LN parallel residual + interleaved
partial rotary + biased lm_head), Granite-MoE (+Shared), Phi-3.5-MoE
(sparsemixer routing + LayerNorm skeleton), dots.llm1 (qwen3 attention
over the DeepSeek-V3 MoE recipe)."""

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.test_model_breadth import _parity, _save


def test_opt_parity(tmp_path_factory):
    from transformers import OPTConfig, OPTForCausalLM

    cfg = OPTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        ffn_dim=128, vocab_size=256, max_position_embeddings=256,
        word_embed_proj_dim=64, do_layer_norm_before=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(60)
    hf = OPTForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_opt"), seed=60)


def test_gptj_parity(tmp_path_factory):
    from transformers import GPTJConfig, GPTJForCausalLM

    cfg = GPTJConfig(
        n_embd=64, n_layer=2, n_head=4, n_inner=128, vocab_size=256,
        n_positions=256, rotary_dim=8,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(61)
    hf = GPTJForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_gptj"), seed=61)


def test_granite_moe_parity(tmp_path_factory):
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    cfg = GraniteMoeConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=48, vocab_size=256,
        max_position_embeddings=256, num_local_experts=4,
        num_experts_per_tok=2, embedding_multiplier=2.0,
        attention_multiplier=0.3, residual_multiplier=0.8,
        logits_scaling=1.5, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(62)
    hf = GraniteMoeForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_granitemoe"), seed=62)


def test_granite_moe_shared_parity(tmp_path_factory):
    from transformers import (
        GraniteMoeSharedConfig,
        GraniteMoeSharedForCausalLM,
    )

    cfg = GraniteMoeSharedConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=48,
        shared_intermediate_size=32, vocab_size=256,
        max_position_embeddings=256, num_local_experts=4,
        num_experts_per_tok=2, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(63)
    hf = GraniteMoeSharedForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_granitemoesh"), seed=63)


def test_phimoe_parity(tmp_path_factory):
    from transformers import PhimoeConfig, PhimoeForCausalLM

    cfg = PhimoeConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=48, vocab_size=256,
        max_position_embeddings=256, num_local_experts=4,
        num_experts_per_tok=2, router_jitter_noise=0.05,
        attention_bias=True, lm_head_bias=True,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0, sliding_window=None,
    )
    torch.manual_seed(64)
    hf = PhimoeForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_phimoe"), seed=64)


def test_dots1_parity(tmp_path_factory):
    from transformers import Dots1Config, Dots1ForCausalLM

    cfg = Dots1Config(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=96, vocab_size=256,
        max_position_embeddings=256, moe_intermediate_size=48,
        n_routed_experts=4, num_experts_per_tok=2, n_shared_experts=1,
        first_k_dense_replace=1, norm_topk_prob=True,
        routed_scaling_factor=1.5, n_group=2, topk_group=1,
        scoring_func="noaux_tc", sliding_window=8,
        layer_types=["sliding_attention", "full_attention",
                     "sliding_attention"],
        attention_bias=False, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(65)
    hf = Dots1ForCausalLM(cfg).eval()
    with torch.no_grad():
        for layer in hf.model.layers:
            if hasattr(layer.mlp, "gate"):
                layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    _parity(
        hf, _save(hf, tmp_path_factory, "tiny_dots1"),
        prompt_len=21, seed=65,
    )


def test_dbrx_parity(tmp_path_factory):
    from transformers import DbrxConfig, DbrxForCausalLM

    cfg = DbrxConfig(
        d_model=64, n_heads=4, n_layers=2, max_seq_len=256, vocab_size=256,
        attn_config=dict(kv_n_heads=2, clip_qkv=6.0, rope_theta=10000.0),
        ffn_config=dict(ffn_hidden_size=48, moe_num_experts=4, moe_top_k=2,
                        moe_normalize_expert_weights=1),
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(66)
    hf = DbrxForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_dbrx"), seed=66)


def test_hunyuan_dense_parity(tmp_path_factory):
    from transformers import HunYuanDenseV1Config, HunYuanDenseV1ForCausalLM

    cfg = HunYuanDenseV1Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, head_dim=16, attention_bias=False,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(67)
    hf = HunYuanDenseV1ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_hunyuan"), seed=67)


def test_hunyuan_moe_parity(tmp_path_factory):
    from transformers import HunYuanMoEV1Config, HunYuanMoEV1ForCausalLM

    cfg = HunYuanMoEV1Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=96, vocab_size=256,
        max_position_embeddings=256, head_dim=16, num_experts=4,
        moe_topk=2, attention_bias=False, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(68)
    hf = HunYuanMoEV1ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_hunyuanmoe"), seed=68)


def test_apertus_parity(tmp_path_factory):
    from transformers import ApertusConfig, ApertusForCausalLM

    cfg = ApertusConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(69)
    hf = ApertusForCausalLM(cfg).eval()
    # give the xIELU scalars non-default values (defaults hide load bugs)
    with torch.no_grad():
        for layer in hf.model.layers:
            layer.mlp.act_fn.alpha_p.fill_(0.3)
            layer.mlp.act_fn.alpha_n.fill_(0.9)
    _parity(hf, _save(hf, tmp_path_factory, "tiny_apertus"), seed=69)


def test_granite_moe_hybrid_parity(tmp_path_factory):
    """Granite 4.0 hybrid: mamba + NoPE-attention layers, granite
    multipliers, shared + routed MoE MLP every layer."""
    from transformers import (
        GraniteMoeHybridConfig,
        GraniteMoeHybridForCausalLM,
    )

    cfg = GraniteMoeHybridConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=96,
        shared_intermediate_size=48, num_local_experts=4,
        num_experts_per_tok=2, vocab_size=256,
        mamba_n_heads=8, mamba_d_head=16, mamba_d_state=32,
        mamba_n_groups=1, mamba_expand=2, mamba_d_conv=4,
        layer_types=["mamba", "attention", "mamba"],
        position_embedding_type="nope", embedding_multiplier=2.0,
        attention_multiplier=0.3, residual_multiplier=0.8,
        logits_scaling=1.5, tie_word_embeddings=True,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(70)
    hf = GraniteMoeHybridForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_gmh"), seed=70)


def test_falcon_h1_parity(tmp_path_factory):
    """Falcon-H1: PARALLEL mamba+attention per layer; all MuP
    multipliers folded into weights at load (set off-default so folding
    bugs cannot hide)."""
    from transformers import FalconH1Config, FalconH1ForCausalLM

    cfg = FalconH1Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=96, vocab_size=256,
        mamba_n_heads=8, mamba_d_head=16, mamba_d_state=32,
        mamba_n_groups=1, mamba_expand=2, mamba_d_conv=4, head_dim=16,
        mamba_d_ssm=128, rope_theta=10000.0,
        embedding_multiplier=1.5, lm_head_multiplier=0.8,
        attention_in_multiplier=1.2, attention_out_multiplier=0.9,
        key_multiplier=1.1, ssm_in_multiplier=0.7, ssm_out_multiplier=1.3,
        mlp_multipliers=[1.4, 0.6], ssm_multipliers=[1.1, 0.9, 1.2, 0.8, 1.05],
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(71)
    hf = FalconH1ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_falconh1"), seed=71)


def test_lfm2_parity(tmp_path_factory):
    """LFM2: gated short-conv layers (per-request conv window in the
    state pool) interleaved with qk-normed attention."""
    from transformers import Lfm2Config, Lfm2ForCausalLM

    cfg = Lfm2Config(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=96, vocab_size=256,
        max_position_embeddings=256, conv_L_cache=3, conv_bias=False,
        block_auto_adjust_ff_dim=True, block_multiple_of=16,
        block_ffn_dim_multiplier=1.0,
        layer_types=["conv", "full_attention", "conv"],
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(72)
    hf = Lfm2ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_lfm2"), seed=72)


def test_cohere2_parity(tmp_path_factory):
    """Command R7B: cohere parallel block, sliding layers rotate
    (interleaved), full-attention layers are NoPE."""
    from transformers import Cohere2Config, Cohere2ForCausalLM

    cfg = Cohere2Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, logit_scale=0.25, sliding_window=8,
        layer_types=["sliding_attention", "sliding_attention",
                     "sliding_attention", "full_attention"],
        tie_word_embeddings=True, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(73)
    hf = Cohere2ForCausalLM(cfg).eval()
    _parity(
        hf, _save(hf, tmp_path_factory, "tiny_cohere2"),
        prompt_len=21, seed=73,
    )
