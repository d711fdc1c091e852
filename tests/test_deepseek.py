"""DeepSeek-V2/V3 MLA parity vs HF transformers (reference `mla` CI
category): logits for a V2-Lite-shaped tiny config (q_lora=None) and a
V3-shaped tiny config (q LoRA + sigmoid scoring + noaux_tc bias)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _parity(path, hf_model, atol=6e-3):
    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    sa = tiny_server_args(model_path=path, load_format="auto", dtype="float32")
    mc = ModelConfig.from_server_args(sa)
    runner = ModelRunner(sa, mc)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 200, size=13).astype(np.int32)
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
        prompt, np.arange(len(prompt)), out_loc, pt,
        np.array([len(prompt)]), np.array([len(prompt)]),
    )
    np.testing.assert_allclose(logits, hf_logits, atol=atol, rtol=atol)
    return runner


def test_deepseek_v2_lite_shape(tmp_path_factory):
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    path = tmp_path_factory.mktemp("tiny_dsv2")
    cfg = DeepseekV2Config(
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        kv_lora_rank=32,
        q_lora_rank=None,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        head_dim=8,
        intermediate_size=96,
        moe_intermediate_size=32,
        n_routed_experts=4,
        num_experts_per_tok=2,
        n_shared_experts=1,
        first_k_dense_replace=1,
        topk_method="greedy",
        norm_topk_prob=False,
        routed_scaling_factor=1.0,
        vocab_size=256,
        max_position_embeddings=256,
        tie_word_embeddings=True,
        aux_loss_alpha=0.0,
    )
    torch.manual_seed(0)
    model = DeepseekV2ForCausalLM(cfg).eval()
    model.save_pretrained(path)
    _parity(str(path), model)


def test_deepseek_v2_greedy_decode(tmp_path_factory):
    """Greedy continuation token-for-token through the paged KV cache."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    path = tmp_path_factory.mktemp("tiny_dsv2_gen")
    cfg = DeepseekV2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, kv_lora_rank=32, q_lora_rank=48,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        intermediate_size=96, moe_intermediate_size=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False, routed_scaling_factor=1.0,
        vocab_size=256, max_position_embeddings=256, tie_word_embeddings=True,
        aux_loss_alpha=0.0,
    )
    torch.manual_seed(1)
    hf = DeepseekV2ForCausalLM(cfg).eval()
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
    prompt = [int(x) for x in np.random.default_rng(3).integers(3, 200, size=9)]
    out = eng.generate(
        input_ids=prompt,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True},
    )
    with torch.no_grad():
        ref = hf.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False
        )[0].tolist()
    assert out["output_ids"] == ref[len(prompt):]


def test_deepseek_v3_shape(tmp_path_factory):
    """V3: q LoRA + sigmoid scoring + noaux_tc e_score_correction_bias."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    path = tmp_path_factory.mktemp("tiny_dsv3")
    cfg = DeepseekV3Config(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4, kv_lora_rank=32, q_lora_rank=48,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        intermediate_size=96, moe_intermediate_size=32, n_routed_experts=8,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        n_group=2, topk_group=1,
        topk_method="noaux_tc", norm_topk_prob=True, routed_scaling_factor=2.0,
        scoring_func="sigmoid",
        vocab_size=256, max_position_embeddings=256, tie_word_embeddings=True,
    )
    torch.manual_seed(2)
    model = DeepseekV3ForCausalLM(cfg).eval()
    with torch.no_grad():
        # non-zero bias so the correction path is actually exercised
        for layer in model.model.layers[1:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.5, 0.5)
    model.save_pretrained(path)
    _parity(str(path), model)


def test_latent_cache_geometry_and_equivalence(tmp_path_factory, monkeypatch):
    """The latent MQA path stores [c_kv ; k_pe] per token (1 shared head)
    and produces the same logits as the decompressed MHA form."""
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    path = tmp_path_factory.mktemp("tiny_dsv2_lat")
    cfg = DeepseekV2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=4, kv_lora_rank=32, q_lora_rank=None,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        intermediate_size=96, moe_intermediate_size=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False, routed_scaling_factor=1.0,
        vocab_size=256, max_position_embeddings=256, tie_word_embeddings=True,
        aux_loss_alpha=0.0,
    )
    torch.manual_seed(5)
    hf = DeepseekV2ForCausalLM(cfg).eval()
    hf.save_pretrained(path)

    # latent (default): one shared kv head of kv_lora + qk_rope dims
    runner = _parity(str(path), hf)
    assert runner.model_config.num_key_value_heads == 1
    assert runner.model_config.head_dim == 32 + 8
    latent_bytes = runner.kv_pool.bytes_per_page()

    # decompressed (opt-out env): per-head K/V at qk_head_dim
    monkeypatch.setenv("SGLANG_TPU_MLA_DECOMPRESS", "1")
    runner2 = _parity(str(path), hf)
    assert runner2.model_config.num_key_value_heads == 4
    assert latent_bytes < runner2.kv_pool.bytes_per_page()


def test_moe_dense_sp_matches_tp(tmp_path_factory):
    """SP for dense MoE layers (P8, reference moe_dense_tp_size): with
    --moe-dense-tp-size 1 the dense layers run token-sharded over the
    "model" axis with replicated weights; logits must equal the plain TP
    sharding exactly."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 virtual devices")
    from transformers import DeepseekV2Config, DeepseekV2ForCausalLM

    path = tmp_path_factory.mktemp("tiny_dsv2_sp")
    cfg = DeepseekV2Config(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=4, kv_lora_rank=32, q_lora_rank=None,
        qk_nope_head_dim=16, qk_rope_head_dim=8, v_head_dim=16, head_dim=8,
        intermediate_size=96, moe_intermediate_size=32, n_routed_experts=4,
        num_experts_per_tok=2, n_shared_experts=1, first_k_dense_replace=1,
        topk_method="greedy", norm_topk_prob=False, routed_scaling_factor=1.0,
        vocab_size=256, max_position_embeddings=256, tie_word_embeddings=True,
        aux_loss_alpha=0.0,
    )
    torch.manual_seed(7)
    hf = DeepseekV2ForCausalLM(cfg).eval()
    hf.save_pretrained(path)

    from sglang_tpu.configs.model_config import ModelConfig
    from sglang_tpu.model_executor.model_runner import ModelRunner
    from tests.test_utils import tiny_server_args

    def logits_for(**over):
        sa = tiny_server_args(
            model_path=str(path), load_format="auto", dtype="float32", **over
        )
        mc = ModelConfig.from_server_args(sa)
        runner = ModelRunner(sa, mc)
        if over.get("moe_dense_tp_size") == 1:
            assert runner.model.dense_sp
        rng = np.random.default_rng(0)
        prompt = rng.integers(0, 200, size=9).astype(np.int32)
        ps = runner.page_size
        n_pages = -(-len(prompt) // ps)
        pages = list(range(1, 1 + n_pages))
        out_loc = np.array(
            [pages[i // ps] * ps + i % ps for i in range(len(prompt))],
            dtype=np.int32,
        )
        pt = np.zeros((1, runner.max_pages_per_req), dtype=np.int32)
        pt[0, : len(pages)] = pages
        return runner.forward_extend_logits(
            prompt, np.arange(len(prompt)), out_loc, pt,
            np.array([len(prompt)]), np.array([len(prompt)]),
        )

    base = logits_for(tp_size=2)
    sp = logits_for(tp_size=2, moe_dense_tp_size=1)
    np.testing.assert_allclose(sp, base, atol=2e-4, rtol=2e-4)
