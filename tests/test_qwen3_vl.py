"""Qwen3-VL (+MoE): deepstack ViT (bilinear pos-table resample,
post-shuffle-norm deepstack mergers) + interleaved M-RoPE text stack,
HF parity at the tower and end-to-end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG, VID, VS = 250, 251, 248
GRID = (1, 4, 4)  # 16 patches -> 4 merged tokens; pos table is 3x3

VCFG = dict(
    depth=4, hidden_size=32, intermediate_size=48, num_heads=2,
    patch_size=14, temporal_patch_size=2, spatial_merge_size=2,
    out_hidden_size=64, num_position_embeddings=9,
    deepstack_visual_indexes=[0, 2], in_channels=3,
    hidden_act="gelu_pytorch_tanh",
)
TCFG = dict(
    hidden_size=64, num_hidden_layers=3, num_attention_heads=4,
    num_key_value_heads=2, intermediate_size=128, vocab_size=256,
    max_position_embeddings=256, rope_theta=10000.0, head_dim=16,
    rope_scaling={
        "rope_type": "default", "mrope_section": [4, 2, 2],
        "mrope_interleaved": True,
    },
    tie_word_embeddings=True, pad_token_id=0,
)


def _engine(path):
    from sglang_tpu import Engine

    return Engine(
        model_path=str(path), dtype="float32", device="cpu", page_size=16,
        context_length=256, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
    )


@pytest.fixture(scope="module")
def q3vl_setup(tmp_path_factory):
    from transformers import Qwen3VLConfig, Qwen3VLForConditionalGeneration

    cfg = Qwen3VLConfig(
        vision_config=dict(VCFG), text_config=dict(TCFG),
        image_token_id=IMG, video_token_id=VID, vision_start_token_id=VS,
    )
    torch.manual_seed(80)
    hf = Qwen3VLForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen3vl")
    hf.save_pretrained(path)
    eng = _engine(path)
    yield hf, eng
    eng.shutdown()


def test_qwen3vl_vision_matches_hf(q3vl_setup):
    """Main embeddings AND all deepstack levels must match the HF tower
    (bilinear pos resample + merge-grouped permute included)."""
    hf, eng = q3vl_setup
    rng = np.random.default_rng(81)
    npatch = GRID[0] * GRID[1] * GRID[2]
    pix = rng.standard_normal((npatch, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref_main, ref_ds = hf.model.visual(
            torch.tensor(pix), grid_thw=torch.tensor([list(GRID)])
        )
    got = np.asarray(eng.runner.encode_images(pix, grid_thw=GRID))
    H = 64
    np.testing.assert_allclose(
        got[:, :H], ref_main.numpy(), atol=3e-4, rtol=3e-4
    )
    for j, r in enumerate(ref_ds):
        np.testing.assert_allclose(
            got[:, H * (1 + j) : H * (2 + j)], r.numpy(),
            atol=3e-4, rtol=3e-4,
        )


def test_qwen3vl_generate_with_image_matches_hf(q3vl_setup):
    hf, eng = q3vl_setup
    rng = np.random.default_rng(82)
    n_img = 4
    ids = (
        rng.integers(3, 240, size=3).tolist()
        + [VS] + [IMG] * n_img
        + rng.integers(3, 240, size=4).tolist()
    )
    npatch = GRID[0] * GRID[1] * GRID[2]
    pix = rng.standard_normal((npatch, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            image_grid_thw=torch.tensor([list(GRID)]),
            max_new_tokens=10, do_sample=False, pad_token_id=0,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data={"pixel_values": pix, "grid_thw": GRID},
        sampling_params={
            "max_new_tokens": 10, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert out["output_ids"] == ref


def test_qwen3vl_text_only_matches_hf(q3vl_setup):
    """No image: the interleaved-mrope stack must reduce to plain rope."""
    hf, eng = q3vl_setup
    rng = np.random.default_rng(83)
    ids = rng.integers(3, 240, size=11).tolist()
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=8,
            do_sample=False, pad_token_id=0,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert out["output_ids"] == ref


def test_qwen3vl_moe_generate_with_image_matches_hf(tmp_path_factory):
    from transformers import (
        Qwen3VLMoeConfig,
        Qwen3VLMoeForConditionalGeneration,
    )

    tc = dict(TCFG)
    tc.update(
        num_experts=4, num_experts_per_tok=2, moe_intermediate_size=48,
        decoder_sparse_step=1, mlp_only_layers=[],
        norm_topk_prob=True,
    )
    cfg = Qwen3VLMoeConfig(
        vision_config=dict(VCFG), text_config=tc,
        image_token_id=IMG, video_token_id=VID, vision_start_token_id=VS,
    )
    torch.manual_seed(84)
    hf = Qwen3VLMoeForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_qwen3vlmoe")
    hf.save_pretrained(path)
    eng = _engine(path)
    try:
        rng = np.random.default_rng(85)
        ids = (
            rng.integers(3, 240, size=3).tolist()
            + [VS] + [IMG] * 4
            + rng.integers(3, 240, size=3).tolist()
        )
        npatch = GRID[0] * GRID[1] * GRID[2]
        pix = rng.standard_normal((npatch, 3 * 2 * 14 * 14)).astype(
            np.float32
        )
        with torch.no_grad():
            ref = hf.generate(
                input_ids=torch.tensor([ids]),
                pixel_values=torch.tensor(pix),
                image_grid_thw=torch.tensor([list(GRID)]),
                max_new_tokens=8, do_sample=False, pad_token_id=0,
            )[0, len(ids):].tolist()
        out = eng.generate(
            input_ids=ids,
            image_data={"pixel_values": pix, "grid_thw": GRID},
            sampling_params={
                "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True
            },
        )
        assert out["output_ids"] == ref
    finally:
        eng.shutdown()
