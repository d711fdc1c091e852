"""Mistral-Small-3.1 (Pixtral ViT + mistral LM): tower parity vs HF and
e2e generate with a native-resolution image."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

IMG = 250


@pytest.fixture(scope="module")
def m3_setup(tmp_path_factory):
    from transformers import Mistral3Config, Mistral3ForConditionalGeneration

    cfg = Mistral3Config(
        vision_config=dict(
            hidden_size=32, intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=2, image_size=112, patch_size=14,
            head_dim=16, rope_theta=10000.0, hidden_act="silu",
        ),
        text_config=dict(
            hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, intermediate_size=96, vocab_size=256,
            max_position_embeddings=256, head_dim=16,
            tie_word_embeddings=True, pad_token_id=0,
        ),
        spatial_merge_size=2, multimodal_projector_bias=False,
        vision_feature_layer=-1, image_token_index=IMG,
    )
    torch.manual_seed(90)
    hf = Mistral3ForConditionalGeneration(cfg).eval()
    path = tmp_path_factory.mktemp("tiny_mistral3")
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


def test_mistral3_features_match_hf(m3_setup):
    """Tower + merger + projector vs HF get_image_features at a
    NON-square native resolution (56x84 -> 4x6 grid -> 6 tokens)."""
    hf, eng = m3_setup
    rng = np.random.default_rng(91)
    pix = rng.standard_normal((1, 3, 56, 84)).astype(np.float32)
    with torch.no_grad():
        ref = hf.get_image_features(
            pixel_values=torch.tensor(pix),
            image_sizes=torch.tensor([[56, 84]]),
            vision_feature_layer=-1,
        )
        ref = ref[0] if isinstance(ref, (tuple, list)) else ref
        ref = np.asarray(ref)
    got = np.asarray(eng.runner.encode_images(pix))
    np.testing.assert_allclose(got, ref.reshape(got.shape), atol=3e-4, rtol=3e-4)


def test_mistral3_generate_with_image_matches_hf(m3_setup):
    hf, eng = m3_setup
    rng = np.random.default_rng(92)
    n_tok = (56 // 14 // 2) * (56 // 14 // 2)  # 2x2 merged grid = 4
    ids = (
        rng.integers(3, 240, size=3).tolist()
        + [IMG] * n_tok
        + rng.integers(3, 240, size=4).tolist()
    )
    pix = rng.standard_normal((1, 3, 56, 56)).astype(np.float32)
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            pixel_values=torch.tensor(pix),
            image_sizes=torch.tensor([[56, 56]]),
            max_new_tokens=8, do_sample=False, pad_token_id=0,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids,
        image_data={"pixel_values": pix},
        sampling_params={
            "max_new_tokens": 8, "temperature": 0.0, "ignore_eos": True
        },
    )
    assert out["output_ids"] == ref
