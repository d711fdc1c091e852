"""Audio input decoding for `/v1/audio/transcriptions`.

WAV (RIFF PCM) decode with the stdlib `wave` module — no audio
dependencies in the image. Other containers (mp3/ogg/flac) are rejected
with a clear error; the reference uses soundfile/librosa for those
(`srt/utils/audio` analogue)."""

from __future__ import annotations

import io
import wave

import numpy as np

WHISPER_SR = 16000


def decode_wav(data: bytes) -> tuple:
    """WAV bytes -> (float32 mono PCM in [-1, 1], sample_rate).

    Resamples to 16 kHz (whisper's rate) by linear interpolation when the
    container rate differs."""
    if not data[:4] == b"RIFF":
        raise ValueError(
            "unsupported audio container (only RIFF/WAV is supported; "
            "transcode to 16-bit PCM WAV)"
        )
    with wave.open(io.BytesIO(data), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        pcm = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:
        pcm = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0
        ) / 128.0
    elif width == 4:
        pcm = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width: {width}")
    if ch > 1:
        pcm = pcm.reshape(-1, ch).mean(axis=1)
    if sr != WHISPER_SR:
        t_new = np.linspace(
            0.0, len(pcm) - 1.0, int(round(len(pcm) * WHISPER_SR / sr))
        )
        pcm = np.interp(t_new, np.arange(len(pcm)), pcm).astype(np.float32)
        sr = WHISPER_SR
    return pcm.astype(np.float32), sr
