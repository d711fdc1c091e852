"""Qwen2-Audio parity vs HF transformers: the audio tower + projector
match get_audio_features, and end-to-end greedy generation with audio
placeholder tokens matches HF token-for-token (reference
srt/models/qwen2_audio.py)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

AUD_TOK = 250
MELS = 16
T = 100  # HF requires T == 2 * max_source_positions (padded mel)


def _tiny():
    from transformers import (
        Qwen2AudioConfig,
        Qwen2AudioEncoderConfig,
        Qwen2AudioForConditionalGeneration,
        Qwen2Config,
    )

    ac = Qwen2AudioEncoderConfig(
        d_model=32, encoder_layers=2, encoder_attention_heads=2,
        encoder_ffn_dim=64, num_mel_bins=MELS, max_source_positions=50,
        scale_embedding=False,
    )
    tc = Qwen2Config(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, intermediate_size=128, vocab_size=256,
        max_position_embeddings=256, tie_word_embeddings=True,
    )
    cfg = Qwen2AudioConfig(
        audio_config=ac, text_config=tc, audio_token_index=AUD_TOK,
    )
    torch.manual_seed(0)
    return Qwen2AudioForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    path = tmp_path_factory.mktemp("tiny_qwen2_audio")
    hf = _tiny()
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


def test_audio_tower_matches_hf(setup):
    hf, eng = setup
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((1, MELS, T)).astype(np.float32) * 0.4
    with torch.no_grad():
        enc = hf.audio_tower(torch.tensor(mel)).last_hidden_state
        ref = hf.multi_modal_projector(enc)[0].numpy()
    got = np.asarray(eng.runner.encode_images(mel))
    assert got.shape == ref.shape, (got.shape, ref.shape)
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-4)


def test_generate_with_audio_matches_hf(setup):
    hf, eng = setup
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, MELS, T)).astype(np.float32) * 0.4
    n_tok = T // 4  # conv stride 2 then avg-pool 2
    pre = rng.integers(3, 240, size=3).tolist()
    post = rng.integers(3, 240, size=4).tolist()
    ids = pre + [AUD_TOK] * n_tok + post
    with torch.no_grad():
        ref = hf.generate(
            input_ids=torch.tensor([ids]),
            input_features=torch.tensor(mel),
            feature_attention_mask=torch.ones(1, T, dtype=torch.long),
            max_new_tokens=8, do_sample=False, pad_token_id=0,
            eos_token_id=None,
        )[0, len(ids):].tolist()
    out = eng.generate(
        input_ids=ids, image_data=mel[0],
        sampling_params={"max_new_tokens": 8, "temperature": 0.0,
                         "ignore_eos": True},
    )
    assert out["output_ids"] == ref
