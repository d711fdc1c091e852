"""HF logit-parity tests for the fifth model-breadth batch: Ernie 4.5,
Seed-OSS, Ministral, EXAONE-4 (post-norm + NoPE hybrid attention),
OLMo-3 (per-layer sliding + dual rope), GLM-4-MoE (partial rotary +
noaux sigmoid router + shared experts + dense-first layers), GLM-4V
(adaptive-pos-embed ViT + interleaved-partial M-RoPE)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.test_model_breadth import _parity, _save


def test_ernie45_parity(tmp_path_factory):
    from transformers import Ernie4_5Config, Ernie4_5ForCausalLM

    cfg = Ernie4_5Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0, head_dim=16,
        tie_word_embeddings=True, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(50)
    hf = Ernie4_5ForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_ernie45"), seed=50)


def test_seed_oss_parity(tmp_path_factory):
    from transformers import SeedOssConfig, SeedOssForCausalLM

    cfg = SeedOssConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0, head_dim=16,
        attention_bias=True, tie_word_embeddings=False,
        bos_token_id=1, eos_token_id=2, pad_token_id=0,
    )
    torch.manual_seed(51)
    hf = SeedOssForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_seedoss"), seed=51)


def test_ministral_parity(tmp_path_factory):
    from transformers import MinistralConfig, MinistralForCausalLM

    cfg = MinistralConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0, head_dim=16,
        sliding_window=8,  # bites inside the 13-token parity prompt
        tie_word_embeddings=True, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(52)
    hf = MinistralForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_ministral"), seed=52)


def test_exaone4_parity(tmp_path_factory):
    from transformers import Exaone4Config, Exaone4ForCausalLM

    cfg = Exaone4Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        sliding_window=8, sliding_window_pattern=2,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(53)
    hf = Exaone4ForCausalLM(cfg).eval()
    _parity(
        hf, _save(hf, tmp_path_factory, "tiny_exaone4"),
        prompt_len=21, seed=53,
    )


def test_olmo3_parity(tmp_path_factory):
    from transformers import Olmo3Config, Olmo3ForCausalLM

    cfg = Olmo3Config(
        hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0,
        sliding_window=8,
        layer_types=[
            "sliding_attention", "sliding_attention",
            "sliding_attention", "full_attention",
        ],
        rope_scaling={
            "rope_type": "llama3", "factor": 2.0,
            "low_freq_factor": 1.0, "high_freq_factor": 4.0,
            "original_max_position_embeddings": 64,
        },
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(54)
    hf = Olmo3ForCausalLM(cfg).eval()
    _parity(
        hf, _save(hf, tmp_path_factory, "tiny_olmo3"),
        prompt_len=21, seed=54,
    )


def test_glm4_moe_parity(tmp_path_factory):
    from transformers import Glm4MoeConfig, Glm4MoeForCausalLM

    cfg = Glm4MoeConfig(
        hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, rope_theta=10000.0, head_dim=16,
        partial_rotary_factor=0.5, use_qk_norm=True, attention_bias=False,
        n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        n_shared_experts=1, first_k_dense_replace=1, norm_topk_prob=True,
        routed_scaling_factor=1.5, n_group=2, topk_group=1,
        tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
        pad_token_id=0,
    )
    torch.manual_seed(55)
    hf = Glm4MoeForCausalLM(cfg).eval()
    # give the correction bias real values (zeros hide selection bugs)
    with torch.no_grad():
        for layer in hf.model.layers:
            if hasattr(layer.mlp, "gate"):
                layer.mlp.gate.e_score_correction_bias.uniform_(-0.2, 0.2)
    _parity(hf, _save(hf, tmp_path_factory, "tiny_glm4moe"), seed=55)


# ---------------------------------------------------------------- GLM-4V

G4V_IMG, G4V_VID = 250, 251
G4V_GRID = (1, 4, 4)  # 16 patches -> 4 merged tokens; pos table is 2x2


@pytest.fixture(scope="module")
def glm4v_setup(tmp_path_factory):
    from transformers import Glm4vConfig, Glm4vForConditionalGeneration

    cfg = Glm4vConfig(
        vision_config=dict(
            depth=2, hidden_size=32, intermediate_size=48, num_heads=2,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=1,
            out_hidden_size=64, image_size=28, in_channels=3,
        ),
        text_config=dict(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=128, vocab_size=256,
            max_position_embeddings=256, rope_theta=10000.0,
            partial_rotary_factor=0.5,
            rope_scaling={"type": "default", "mrope_section": [1, 1, 2]},
            tie_word_embeddings=True, pad_token_id=0,
        ),
        image_token_id=G4V_IMG, video_token_id=G4V_VID,
        image_start_token_id=248, image_end_token_id=249,
        video_start_token_id=246, video_end_token_id=247,
    )
    torch.manual_seed(60)
    hf = Glm4vForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_glm4v")
    hf.save_pretrained(path)
    from sglang_tpu import Engine

    eng = Engine(
        model_path=str(path), dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
    )
    yield hf, eng
    eng.shutdown()


def test_glm4v_bicubic_resample_matches_torch_grid_sample():
    """The static gather plan must reproduce torch's bicubic grid_sample
    (align_corners=False, border padding) including the non-identity
    resize path (2x2 table -> 4x4 grid)."""
    from sglang_tpu.models.glm4v import adapt_pos_embed

    rng = np.random.default_rng(0)
    for S, gh, gw in [(2, 4, 4), (2, 2, 2), (4, 6, 3), (5, 2, 7)]:
        tab = rng.standard_normal((S * S, 8)).astype(np.float32)
        hh, ww = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
        norm_w = ((ww.reshape(-1) + 0.5) / gw) * 2 - 1
        norm_h = ((hh.reshape(-1) + 0.5) / gh) * 2 - 1
        grid = (
            torch.tensor(np.stack([norm_w, norm_h], -1), dtype=torch.float32)
            .unsqueeze(0)
            .unsqueeze(2)
        )
        img = (
            torch.tensor(tab).view(S, S, 8).permute(2, 0, 1).unsqueeze(0)
        )
        ref = (
            torch.nn.functional.grid_sample(
                img, grid, mode="bicubic", align_corners=False,
                padding_mode="border",
            )
            .squeeze(0)
            .squeeze(-1)
            .permute(1, 0)
            .numpy()
        )
        got = adapt_pos_embed(tab, gh, gw)
        np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_glm4v_vision_matches_hf(glm4v_setup):
    hf, eng = glm4v_setup
    rng = np.random.default_rng(61)
    npatch = G4V_GRID[0] * G4V_GRID[1] * G4V_GRID[2]
    pix = rng.standard_normal((npatch, 3 * 1 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(pix), grid_thw=torch.tensor([list(G4V_GRID)])
        ).numpy()
    got = np.asarray(eng.runner.encode_images(pix, grid_thw=G4V_GRID))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_glm4v_generate_with_image_matches_hf(glm4v_setup):
    hf, eng = glm4v_setup
    rng = np.random.default_rng(62)
    n_img = 4
    ids = (
        rng.integers(3, 240, size=3).tolist()
        + [248] + [G4V_IMG] * n_img + [249]
        + rng.integers(3, 240, size=4).tolist()
    )
    npatch = G4V_GRID[0] * G4V_GRID[1] * G4V_GRID[2]
    pix = rng.standard_normal((npatch, 3 * 1 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            image_grid_thw=torch.tensor([list(G4V_GRID)]),
            max_new_tokens=10, do_sample=False, pad_token_id=0,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data={"pixel_values": pix, "grid_thw": G4V_GRID},
        sampling_params={
            "max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert out["output_ids"] == ref
