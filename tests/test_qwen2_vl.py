"""Qwen2-VL parity vs HF transformers: get_rope_index port, the vision
tower + merger, and end-to-end greedy generation with an image."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG_TOK, VID_TOK, VSTART = 250, 251, 249


def _tiny_cfg():
    from transformers import Qwen2VLConfig

    return Qwen2VLConfig(
        vision_config=dict(
            depth=2, embed_dim=32, hidden_size=64, num_heads=2, in_channels=3,
            patch_size=14, spatial_merge_size=2, temporal_patch_size=2,
            mlp_ratio=2,
        ),
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
        rope_scaling={"type": "mrope", "mrope_section": [2, 3, 3]},
        image_token_id=IMG_TOK, video_token_id=VID_TOK,
        vision_start_token_id=VSTART,
    )


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    from transformers import Qwen2VLForConditionalGeneration

    path = tmp_path_factory.mktemp("tiny_qwen2vl")
    torch.manual_seed(0)
    hf = Qwen2VLForConditionalGeneration(_tiny_cfg()).eval()
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


GRID = (1, 4, 4)  # 16 patches -> 4 merged image tokens
N_IMG = 4


def _prompt(rng):
    pre = rng.integers(3, 240, size=3).tolist()
    post = rng.integers(3, 240, size=4).tolist()
    return pre + [VSTART] + [IMG_TOK] * N_IMG + post


def test_get_rope_index_matches_hf(setup):
    hf, eng = setup
    rng = np.random.default_rng(0)
    ids = _prompt(rng)
    grid = torch.tensor([list(GRID)])
    ref_pos, ref_delta = hf.model.get_rope_index(
        torch.tensor([ids]), grid, None, None
    )
    pos, delta = eng.runner.model.get_rope_index(ids, [GRID])
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])


def test_vision_tower_matches_hf(setup):
    hf, eng = setup
    rng = np.random.default_rng(1)
    npatch = GRID[0] * GRID[1] * GRID[2]
    pix = rng.standard_normal((npatch, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf.model.visual(
            torch.tensor(pix), grid_thw=torch.tensor([list(GRID)])
        ).numpy()
    got = eng.runner.encode_images(pix, grid_thw=GRID)
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_generate_with_image_matches_hf(setup):
    hf, eng = setup
    rng = np.random.default_rng(2)
    ids = _prompt(rng)
    npatch = GRID[0] * GRID[1] * GRID[2]
    pix = rng.standard_normal((npatch, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            image_grid_thw=torch.tensor([list(GRID)]),
            max_new_tokens=10, do_sample=False, pad_token_id=0,
            eos_token_id=None,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data={"pixel_values": pix, "grid_thw": GRID},
        sampling_params={"max_new_tokens": 10, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == ref
    assert eng.scheduler.check_memory() == 0


def test_text_only_matches_hf(setup):
    """Text-only requests use the standard rope path (equal axes ==
    standard rotary) and must match HF exactly."""
    hf, eng = setup
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 240, size=9).tolist()
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]), max_new_tokens=8, do_sample=False,
            pad_token_id=0, eos_token_id=None,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == ref


VGRID = (2, 4, 4)  # 2 temporal patch groups -> 8 merged video tokens
N_VID = 8


def test_generate_with_video_matches_hf(setup):
    """Video spans (C17): the same ViT tiles the temporal axis and
    get_rope_index advances the t coordinate per frame; greedy output
    must equal HF with pixel_values_videos."""
    hf, eng = setup
    rng = np.random.default_rng(5)
    pre = rng.integers(3, 240, size=3).tolist()
    post = rng.integers(3, 240, size=4).tolist()
    ids = pre + [VSTART] + [VID_TOK] * N_VID + post
    npatch = VGRID[0] * VGRID[1] * VGRID[2]
    pix = rng.standard_normal((npatch, 3 * 2 * 14 * 14)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values_videos=torch.tensor(pix),
            video_grid_thw=torch.tensor([list(VGRID)]),
            max_new_tokens=8, do_sample=False, pad_token_id=0,
            eos_token_id=None,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data={"pixel_values": pix, "grid_thw": VGRID},
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == ref
    # rope-index parity for the video span specifically
    ref_pos, ref_delta = hf.model.get_rope_index(
        torch.tensor([ids]), None, torch.tensor([list(VGRID)]), None
    )
    pos, delta = eng.runner.model.get_rope_index(ids, [VGRID])
    np.testing.assert_array_equal(pos, ref_pos[:, 0].numpy())
    assert delta == int(ref_delta[0, 0])
