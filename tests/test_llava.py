"""LLaVA multimodal parity vs HF transformers (reference `mm` CI
category): vision tower + projector match get_image_features, and
end-to-end greedy generation with an image matches HF token-for-token."""

import uuid

import numpy as np
import pytest

torch = pytest.importorskip("torch")

IMG_TOK = 250


def _tiny_llava():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    vc = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=28, patch_size=14,
    )
    tc = LlamaConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    cfg = LlavaConfig(
        vision_config=vc, text_config=tc, image_token_index=IMG_TOK,
        projector_hidden_act="gelu", vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    torch.manual_seed(0)
    return LlavaForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_llava")
    hf = _tiny_llava()
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


def test_vision_tower_matches_hf(setup):
    hf, eng = setup
    rng = np.random.default_rng(0)
    pix = rng.standard_normal((2, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(
            torch.tensor(pix), vision_feature_layer=-2,
            vision_feature_select_strategy="default",
        )
        if isinstance(ref, (list, tuple)):
            ref = torch.cat(list(ref), dim=0)
        ref = ref.reshape(-1, ref.shape[-1]).numpy()
    got = eng.runner.encode_images(pix)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-4)


def _prompt(rng, n_pre=3, n_post=4):
    pre = rng.integers(3, 240, size=n_pre).tolist()
    post = rng.integers(3, 240, size=n_post).tolist()
    return pre + [IMG_TOK] * 4 + post  # (28/14)^2 = 4 image tokens


def test_generate_with_image_matches_hf(setup):
    hf, eng = setup
    rng = np.random.default_rng(1)
    ids = _prompt(rng)
    pix = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pix),
            max_new_tokens=10, do_sample=False, pad_token_id=0,
            eos_token_id=None,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids, image_data=pix,
        sampling_params={"max_new_tokens": 10, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == ref


def test_two_images_two_requests_are_distinct(setup):
    """Identical token ids with DIFFERENT images must produce different
    outputs (the mm cache bypass: ids alone don't identify content)."""
    hf, eng = setup
    rng = np.random.default_rng(2)
    ids = _prompt(rng)
    sp = {"max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True}
    pix_a = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    pix_b = -pix_a
    out_a = eng.generate(input_ids=ids, image_data=pix_a, sampling_params=sp)
    out_b = eng.generate(input_ids=ids, image_data=pix_b, sampling_params=sp)

    def hf_ref(pix):
        with torch.no_grad():
            return hf.generate(
                input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pix),
                max_new_tokens=8, do_sample=False, pad_token_id=0,
                eos_token_id=None,
            )[0, len(ids):].tolist()

    # each request matches ITS image's HF output: the second is not
    # poisoned by any cache entry from the first (mm reqs bypass radix)
    assert out_a["output_ids"] == hf_ref(pix_a)
    assert out_b["output_ids"] == hf_ref(pix_b)
    assert out_b["meta_info"]["cached_tokens"] == 0
    assert eng.scheduler.check_memory() == 0


def test_text_only_request_on_llava(setup):
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


def test_same_image_second_request_hits_cache(setup):
    """MM prefix caching (reference RadixKey extra_key,
    `srt/mem_cache/radix_cache.py:66`): the radix key hashes image
    content, so a second request with the SAME image hits cache, and the
    output still matches HF exactly."""
    hf, eng = setup
    rng = np.random.default_rng(5)
    # long enough for a page-aligned (16) prefix
    ids = _prompt(rng, n_pre=20, n_post=18)
    pix = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    sp = {"max_new_tokens": 6, "temperature": 0.0, "ignore_eos": True}
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pix),
            max_new_tokens=6, do_sample=False, pad_token_id=0,
            eos_token_id=None,
        )[0, len(ids):].tolist()
    out1 = eng.generate(input_ids=ids, image_data=pix, sampling_params=sp)
    out2 = eng.generate(input_ids=ids, image_data=pix, sampling_params=sp)
    assert out1["output_ids"] == ref
    assert out2["output_ids"] == ref
    # the whole aligned prompt prefix came from cache on the second turn
    assert out2["meta_info"]["cached_tokens"] >= (len(ids) // 16) * 16 - 16
    # a DIFFERENT image with the same token ids must NOT hit that prefix
    pix2 = -pix
    out3 = eng.generate(input_ids=ids, image_data=pix2, sampling_params=sp)
    with torch.no_grad():
        ref2 = hf.generate(
            input_ids=torch.tensor([ids]), pixel_values=torch.tensor(pix2),
            max_new_tokens=6, do_sample=False, pad_token_id=0,
            eos_token_id=None,
        )[0, len(ids):].tolist()
    assert out3["output_ids"] == ref2
    assert out3["meta_info"]["cached_tokens"] <= 16  # only the text-only first page may hit; image pages must not
    assert eng.scheduler.check_memory() == 0
