"""HF logit-parity tests for the fourth model-breadth batch: Llama-4
(interleaved rope + nope temperature tuning + input-scaled sigmoid MoE +
shared expert), and the batch-4 vision-language families."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tests.test_model_breadth import _parity, _save


def _llama4_cfg(**over):
    from transformers import Llama4TextConfig

    kw = dict(
        hidden_size=64,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        intermediate_size=96,  # routed expert dim
        intermediate_size_mlp=128,  # dense-layer dim
        num_local_experts=4,
        num_experts_per_tok=1,
        interleave_moe_layer_step=1,
        no_rope_layer_interval=4,
        attention_chunk_size=8192,
        use_qk_norm=True,
        attn_temperature_tuning=True,
        vocab_size=256,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rope_scaling=None,
        tie_word_embeddings=True,
        bos_token_id=1,
        eos_token_id=2,
        pad_token_id=0,
    )
    kw.update(over)
    return Llama4TextConfig(**kw)


def test_llama4_all_moe_parity(tmp_path_factory):
    from transformers import Llama4ForCausalLM

    torch.manual_seed(40)
    hf = Llama4ForCausalLM(_llama4_cfg()).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_llama4"), seed=40)


def test_llama4_interleaved_moe_parity(tmp_path_factory):
    """128E-style: every 2nd layer MoE, the rest dense with the larger
    intermediate_size_mlp; top-2 routing exercises multi-expert sums."""
    from transformers import Llama4ForCausalLM

    torch.manual_seed(41)
    hf = Llama4ForCausalLM(
        _llama4_cfg(
            interleave_moe_layer_step=2,
            num_experts_per_tok=2,
            use_qk_norm=False,
        )
    ).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_llama4_128e"), seed=41)


IVL_IMG_TOK = 250


def _tiny_internvl(norm_type="layer_norm", qk_norm=False):
    from transformers import InternVLConfig, InternVLForConditionalGeneration

    vc = dict(
        hidden_size=32, num_attention_heads=2, num_hidden_layers=2,
        intermediate_size=64, image_size=(32, 32), patch_size=(8, 8),
        norm_type=norm_type, use_qk_norm=qk_norm, layer_scale_init_value=0.1,
        hidden_act="gelu", attention_bias=False,
    )
    tc = dict(
        model_type="qwen2", hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=128,
        vocab_size=256, max_position_embeddings=256,
        tie_word_embeddings=True, rope_theta=10000.0,
    )
    cfg = InternVLConfig(
        vision_config=vc, text_config=tc, image_token_id=IVL_IMG_TOK,
        downsample_ratio=0.5, vision_feature_layer=-1,
        vision_feature_select_strategy="default",
    )
    torch.manual_seed(43)
    return InternVLForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def internvl_setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_internvl")
    hf = _tiny_internvl()
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


def test_internvl_vision_matches_hf(internvl_setup):
    hf, eng = internvl_setup
    rng = np.random.default_rng(5)
    pix = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(pix))
        ref = ref.reshape(-1, ref.shape[-1]).numpy()
    got = np.asarray(eng.runner.encode_images(pix))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_internvl_generate_with_image_matches_hf(internvl_setup):
    hf, eng = internvl_setup
    rng = np.random.default_rng(6)
    # 32/8 grid -> 16 patches, pixel-shuffled by 0.5 -> 4 tokens per tile
    ids = (
        rng.integers(3, 240, size=3).tolist()
        + [IVL_IMG_TOK] * 4
        + rng.integers(3, 240, size=4).tolist()
    )
    pix = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pix),
            max_new_tokens=10, do_sample=False, pad_token_id=0,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data=pix,
        sampling_params={
            "max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert out["output_ids"] == ref


IDF_IMG_TOK = 257


@pytest.fixture(scope="module")
def idefics3_setup(tmp_path_factory):
    from transformers import Idefics3Config, Idefics3ForConditionalGeneration

    vc = dict(
        hidden_size=32, num_attention_heads=2, num_hidden_layers=2,
        intermediate_size=64, image_size=32, patch_size=8,
    )
    tc = dict(
        model_type="llama", hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=128,
        vocab_size=260, max_position_embeddings=256,
        tie_word_embeddings=False, rope_theta=10000.0,
    )
    cfg = Idefics3Config(
        vision_config=vc, text_config=tc, image_token_id=IDF_IMG_TOK,
        scale_factor=2,
    )
    torch.manual_seed(44)
    hf = Idefics3ForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_idefics3")
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


def test_idefics3_vision_matches_hf(idefics3_setup):
    hf, eng = idefics3_setup
    rng = np.random.default_rng(7)
    pix = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        # HF expects [B, num_images, 3, S, S]
        ref = hf.get_image_features(torch.tensor(pix)[None])
        ref = ref.reshape(-1, ref.shape[-1]).numpy()
    got = np.asarray(eng.runner.encode_images(pix))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_idefics3_generate_with_image_matches_hf(idefics3_setup):
    hf, eng = idefics3_setup
    rng = np.random.default_rng(8)
    # 32/8 grid -> 16 patches, shuffled by sf=2 -> 4 tokens per tile
    ids = (
        rng.integers(3, 250, size=3).tolist()
        + [IDF_IMG_TOK] * 4
        + rng.integers(3, 250, size=5).tolist()
    )
    pix = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pix)[None],
            max_new_tokens=10, do_sample=False, pad_token_id=0,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data=pix,
        sampling_params={
            "max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert out["output_ids"] == ref


AYA_IMG_TOK = 257


@pytest.fixture(scope="module")
def aya_setup(tmp_path_factory):
    from transformers import AyaVisionConfig, AyaVisionForConditionalGeneration

    vc = dict(
        hidden_size=32, num_attention_heads=2, num_hidden_layers=2,
        intermediate_size=64, image_size=32, patch_size=8,
    )
    tc = dict(
        model_type="cohere", hidden_size=64, num_attention_heads=4,
        num_key_value_heads=2, num_hidden_layers=2, intermediate_size=128,
        vocab_size=260, max_position_embeddings=256, rope_theta=10000.0,
    )
    cfg = AyaVisionConfig(
        vision_config=vc, text_config=tc, image_token_index=AYA_IMG_TOK,
        downsample_factor=2, adapter_layer_norm_eps=1e-6,
        alignment_intermediate_size=64,
    )
    torch.manual_seed(45)
    hf = AyaVisionForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_aya")
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


def test_aya_vision_matches_hf(aya_setup):
    hf, eng = aya_setup
    rng = np.random.default_rng(9)
    pix = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(torch.tensor(pix))
        ref = ref.reshape(-1, ref.shape[-1]).numpy()
    got = np.asarray(eng.runner.encode_images(pix))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_aya_generate_with_image_matches_hf(aya_setup):
    hf, eng = aya_setup
    rng = np.random.default_rng(10)
    ids = (
        rng.integers(3, 250, size=3).tolist()
        + [AYA_IMG_TOK] * 4
        + rng.integers(3, 250, size=4).tolist()
    )
    pix = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pix),
            max_new_tokens=10, do_sample=False, pad_token_id=0,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data=pix,
        sampling_params={
            "max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert out["output_ids"] == ref


Q25_IMG, Q25_VID, Q25_VS = 250, 251, 249
Q25_GRID = (1, 8, 8)  # 64 patches, window 2x2 merge groups -> 16 tokens


@pytest.fixture(scope="module")
def q25vl_setup(tmp_path_factory):
    from transformers import (
        Qwen2_5_VLConfig,
        Qwen2_5_VLForConditionalGeneration,
    )

    cfg = Qwen2_5_VLConfig(
        vision_config=dict(
            depth=3, hidden_size=32, intermediate_size=64, num_heads=2,
            in_channels=3, patch_size=14, spatial_merge_size=2,
            temporal_patch_size=2, out_hidden_size=64,
            # window = 2 merge groups per side: 2 * 2 * 14 = 56 px
            window_size=56, fullatt_block_indexes=[1],
        ),
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=Q25_IMG, video_token_id=Q25_VID,
        vision_start_token_id=Q25_VS,
    )
    torch.manual_seed(46)
    hf = Qwen2_5_VLForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen25vl")
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


def test_qwen25vl_vision_matches_hf(q25vl_setup):
    hf, eng = q25vl_setup
    rng = np.random.default_rng(11)
    npatch = Q25_GRID[0] * Q25_GRID[1] * Q25_GRID[2]
    pix = rng.standard_normal((npatch, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(pix), grid_thw=torch.tensor([list(Q25_GRID)])
        ).numpy()
    got = np.asarray(eng.runner.encode_images(pix, grid_thw=Q25_GRID))
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_qwen25vl_generate_with_image_matches_hf(q25vl_setup):
    hf, eng = q25vl_setup
    rng = np.random.default_rng(12)
    n_img = 16
    ids = (
        rng.integers(3, 240, size=3).tolist()
        + [Q25_VS]
        + [Q25_IMG] * n_img
        + rng.integers(3, 240, size=4).tolist()
    )
    npatch = Q25_GRID[0] * Q25_GRID[1] * Q25_GRID[2]
    pix = rng.standard_normal((npatch, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            image_grid_thw=torch.tensor([list(Q25_GRID)]),
            max_new_tokens=10, do_sample=False, pad_token_id=0,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data={"pixel_values": pix, "grid_thw": Q25_GRID},
        sampling_params={
            "max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert out["output_ids"] == ref


def test_phi4_multimodal_text_parity(tmp_path_factory):
    """Phi-4-multimodal TEXT path: the base decoder with adapters
    unloaded must match HF's text-only forward (partial rotary)."""
    from transformers import Phi4MultimodalConfig, Phi4MultimodalForCausalLM

    vc = dict(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8, crop_size=32,
    )
    ac = dict(
        hidden_size=32, num_blocks=2, num_attention_heads=2,
        intermediate_size=64,
    )
    cfg = Phi4MultimodalConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=260,
        max_position_embeddings=256, pad_token_id=0, rope_theta=10000.0,
        partial_rotary_factor=0.75, tie_word_embeddings=False,
        vision_config=vc, audio_config=ac,
    )
    torch.manual_seed(47)
    hf = Phi4MultimodalForCausalLM(cfg).eval()
    _parity(hf, _save(hf, tmp_path_factory, "tiny_phi4mm"), seed=47)


def test_llama4_long_position_temperature(tmp_path_factory):
    """NoPE temperature tuning only bites past floor_scale positions —
    use a tiny floor_scale so the parity run crosses it."""
    from transformers import Llama4ForCausalLM

    torch.manual_seed(42)
    hf = Llama4ForCausalLM(_llama4_cfg(floor_scale=8.0)).eval()
    _parity(
        hf,
        _save(hf, tmp_path_factory, "tiny_llama4_floor"),
        prompt_len=29,
        seed=42,
    )
