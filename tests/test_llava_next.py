"""LLaVA-NeXT (anyres) parity vs HF transformers: end-to-end greedy
generation with a tiled image matches HF token-for-token. The prompt's
<image> placeholder count comes from OUR pack_anyres_features output —
HF's generate validates the count (it raises on feature/placeholder
mismatch) and the token-exact output validates the packed values."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG_TOK = 250
S = 28  # vision image size (2x2 patches of 14)


def _tiny_llava_next():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaNextConfig,
        LlavaNextForConditionalGeneration,
    )

    vc = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=S, patch_size=14,
    )
    tc = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=512, tie_word_embeddings=True,
    )
    cfg = LlavaNextConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        projector_hidden_act="gelu", vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=[[S, 2 * S], [2 * S, S], [2 * S, 2 * S]],
    )
    torch.manual_seed(0)
    return LlavaNextForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_llava_next")
    hf = _tiny_llava_next()
    hf.save_pretrained(path)

    from sglang_tpu import Engine

    eng = Engine(
        model_path=str(path), dtype="float32", device="cpu", page_size=16,
        context_length=512, max_total_tokens=2048,
        prefill_token_buckets=[64, 128], decode_bs_buckets=[4, 8],
        max_running_requests=8, skip_tokenizer_init=True, random_seed=0,
        log_level="warning",
    )
    yield hf, eng
    eng.shutdown()


def _pack(eng, pix, sizes):
    model = eng.runner.model
    flat = pix.reshape((-1,) + pix.shape[2:])
    tower = np.asarray(eng.runner.encode_images(flat))
    return model.pack_anyres_features(
        tower, pix.shape[0], pix.shape[1], sizes,
        np.asarray(eng.runner.params["image_newline"]),
    )


@pytest.mark.parametrize("sizes", [[[50, 40]], [[30, 55]]])
def test_generate_anyres_matches_hf(setup, sizes):
    hf, eng = setup
    rng = np.random.default_rng(sizes[0][0])
    pix = rng.standard_normal((1, 5, 3, S, S)).astype(np.float32)
    packed = _pack(eng, pix, sizes)
    n_img_tok = packed.shape[0]
    pre = rng.integers(3, 240, size=3).tolist()
    post = rng.integers(3, 240, size=4).tolist()
    ids = pre + [IMG_TOK] * n_img_tok + post
    with torch.no_grad():
        # HF raises on feature-count/placeholder mismatch, so a successful
        # generate also validates pack_anyres_features' token count
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            image_sizes=torch.tensor(sizes),
            max_new_tokens=8, do_sample=False, pad_token_id=0,
            eos_token_id=None,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data={"pixel_values": pix, "image_sizes": sizes},
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == ref


def test_select_best_resolution_matches_hf():
    from transformers.image_processing_utils import select_best_resolution as hf_sbr

    from sglang_tpu.models.llava_next import select_best_resolution

    pins = [[S, 2 * S], [2 * S, S], [2 * S, 2 * S], [3 * S, S]]
    rng = np.random.default_rng(0)
    for _ in range(50):
        hw = (int(rng.integers(10, 200)), int(rng.integers(10, 200)))
        assert tuple(hf_sbr(hw, pins)) == select_best_resolution(hw, pins)
