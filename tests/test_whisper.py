"""Whisper audio modality: HF parity + feature frontend + HTTP route.

Reference analogue: `srt/models/whisper.py` and the
`/v1/audio/transcriptions` route."""

import io
import wave

import numpy as np
import pytest

torch = pytest.importorskip("torch")


TINY = dict(
    d_model=64,
    encoder_layers=2,
    decoder_layers=2,
    encoder_attention_heads=4,
    decoder_attention_heads=4,
    encoder_ffn_dim=128,
    decoder_ffn_dim=128,
    num_mel_bins=32,
    vocab_size=300,
    max_source_positions=80,
    max_target_positions=64,
    decoder_start_token_id=257,
    eos_token_id=256,
    pad_token_id=256,
)


@pytest.fixture(scope="module")
def hf_and_path(tmp_path_factory):
    from transformers import WhisperConfig, WhisperForConditionalGeneration

    path = tmp_path_factory.mktemp("whisper_tiny")
    cfg = WhisperConfig(**TINY)
    torch.manual_seed(0)
    hf = WhisperForConditionalGeneration(cfg).eval()
    hf.save_pretrained(path)
    return hf, str(path)


def _mel(seed=0, t=160):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((TINY["num_mel_bins"], t)) * 0.4).astype(
        np.float32
    )


def test_whisper_greedy_matches_hf(hf_and_path):
    """Token-exact greedy parity: our jitted scan decoder vs a manual HF
    decoding loop (encoder_outputs + growing decoder_input_ids)."""
    hf, path = hf_and_path
    from sglang_tpu.models.whisper import WhisperForConditionalGeneration

    mel = _mel(0)
    n_new = 12
    with torch.no_grad():
        feats = torch.tensor(mel)[None]
        enc = hf.model.encoder(feats).last_hidden_state
        ids = [TINY["decoder_start_token_id"]]
        for _ in range(n_new):
            out = hf(
                decoder_input_ids=torch.tensor([ids]),
                encoder_outputs=(enc,),
            )
            nxt = int(out.logits[0, -1].argmax())
            ids.append(nxt)
            if nxt == TINY["eos_token_id"]:
                break
        want = ids[1:]
        if want and want[-1] == TINY["eos_token_id"]:
            want = want[:-1]

    m = WhisperForConditionalGeneration(TINY).load(path)
    got = m.transcribe_ids(mel, max_new_tokens=n_new)[0]
    assert got == want, (got, want)


def test_whisper_batch_and_prompt(hf_and_path):
    """Batched mels decode independently; a forced decoder prefix is
    teacher-forced before generation."""
    hf, path = hf_and_path
    from sglang_tpu.models.whisper import WhisperForConditionalGeneration

    m = WhisperForConditionalGeneration(TINY).load(path)
    m1 = _mel(1)
    m2 = _mel(2)
    solo = [m.transcribe_ids(x, max_new_tokens=8)[0] for x in (m1, m2)]
    both = m.transcribe_ids(np.stack([m1, m2]), max_new_tokens=8)
    assert both == solo

    sot = TINY["decoder_start_token_id"]
    with_prefix = m.transcribe_ids(
        m1, prompt_ids=[sot, 5, 9], max_new_tokens=6
    )[0]
    assert len(with_prefix) <= 6


def _wav_bytes(sr=16000, seconds=0.3, seed=3):
    rng = np.random.default_rng(seed)
    pcm = (rng.standard_normal(int(sr * seconds)) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_wav_decode_helper():
    from sglang_tpu.entrypoints.audio import decode_wav

    pcm, sr = decode_wav(_wav_bytes())
    assert sr == 16000
    assert pcm.dtype == np.float32 and abs(pcm).max() <= 1.0
    assert len(pcm) == 4800


def test_audio_transcription_route(hf_and_path):
    """End-to-end /v1/audio/transcriptions over a real aiohttp server with
    the tiny whisper engine (token-id transcript: the tiny config has no
    trained tokenizer, so the route falls back to ids-as-text)."""
    _, path = hf_and_path
    import asyncio
    import json as _json

    from sglang_tpu.entrypoints.engine import Engine

    eng = Engine(
        model_path=path, device="cpu", dtype="float32",
        skip_tokenizer_init=True, log_level="warning",
    )
    try:
        assert eng.is_audio_model
        # feature extractor needs n_mels matching; tiny config uses 32 —
        # build features directly (the route does the same via
        # WhisperFeatureExtractor when preprocessor config exists)
        out = eng.transcribe(mel=_mel(4), max_new_tokens=6)
        assert isinstance(out["token_ids"], list)
        assert out["text"] is None or isinstance(out["text"], str)
    finally:
        eng.shutdown()


def test_audio_transcriptions_http_route(hf_and_path, tmp_path):
    """Launch the real HTTP server with the whisper checkpoint and POST a
    multipart WAV to /v1/audio/transcriptions."""
    import os
    import socket
    import subprocess
    import sys
    import time
    import urllib.request

    _, path = hf_and_path
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu", HF_HUB_OFFLINE="1",
               TRANSFORMERS_OFFLINE="1")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [sys.executable, "-m", "sglang_tpu.launch_server",
         "--model-path", path, "--host", "127.0.0.1", "--port", str(port),
         "--skip-tokenizer-init", "--device", "cpu",
         "--random-seed", "0", "--log-level", "warning"],
        env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if proc.poll() is not None:
                raise RuntimeError(
                    "server died:\n" + proc.stdout.read().decode()[-2000:]
                )
            try:
                urllib.request.urlopen(base + "/health", timeout=1)
                break
            except Exception:
                time.sleep(0.5)
        else:
            raise RuntimeError("server never healthy")
        wav = _wav_bytes(seconds=0.5)
        boundary = "xxwhisperboundary"
        body = (
            f"--{boundary}\r\n"
            'Content-Disposition: form-data; name="file"; '
            'filename="a.wav"\r\n'
            "Content-Type: audio/wav\r\n\r\n"
        ).encode() + wav + f"\r\n--{boundary}--\r\n".encode()
        req = urllib.request.Request(
            base + "/v1/audio/transcriptions",
            data=body,
            headers={
                "Content-Type": f"multipart/form-data; boundary={boundary}"
            },
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.status == 200
            import json as _json

            out = _json.loads(r.read())
        assert isinstance(out["text"], str)
    finally:
        proc.kill()
        proc.wait()
